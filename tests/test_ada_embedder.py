"""Oracle parity: legacy AttentionalPooler / AdaEmbedding / Embedding3d.

These classes are dormant in the reference (AdaEmbedding is never
instantiated anywhere in its tree), so parity here is checkpoint-migration
insurance, not a training-path test: random torch weights -> from_torch ->
identical outputs in eval semantics.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface import ada_embedder as ae

import torch_oracle


def _layer_attn(torch_seed, b, l, c, d_ctx):
    g = torch.Generator().manual_seed(torch_seed)
    x = torch.randn(b, l, c, generator=g)
    q = torch.randn(b, l, c, generator=g)
    to_k = torch.nn.Linear(d_ctx, c, bias=False)
    with torch.no_grad():
        to_k.weight.normal_(0, 0.2, generator=g)
    hw = int(np.sqrt(l))
    comps = {"x": x, "q": q, "to_k": to_k, "infeat_size": (hw, hw)}
    jcomps = {"x": jnp.asarray(x.numpy()), "q": jnp.asarray(q.numpy()),
              "to_k_w": jnp.asarray(to_k.weight.detach().numpy().T),
              "infeat_size": (hw, hw)}
    return comps, jcomps


@pytest.mark.parametrize("with_mask", [False, True])
def test_attentional_pooler_parity(with_mask):
    em = torch_oracle.load("ldm.modules.embedding_manager")
    torch.manual_seed(0)
    b, l, c, d_ctx = 2, 64, 64, 32
    ref = em.AttentionalPooler(layer_idx=0, feat_dim=c,
                               feat_reduction_ratio=8, infeat_grad_scale=1)
    ref.eval()
    comps, jcomps = _layer_attn(1, b, l, c, d_ctx)
    fg_q = torch.randn(d_ctx)
    bg_q = torch.randn(b, d_ctx)
    mask = None
    jmask = None
    if with_mask:
        mask = (torch.rand(b, 1, 16, 16) > 0.3).float()
        jmask = jnp.asarray(mask.numpy())
    with torch.no_grad():
        want = ref(comps, fg_q_emb=fg_q, bg_q_emb=bg_q, img_mask=mask)

    cfg = ae.AttnPoolerConfig(feat_dim=c, infeat_grad_scale=1.0)
    params = ae.attn_pooler_from_torch(ref.state_dict())
    got = ae.attn_pooler_forward(params, cfg, jcomps,
                                 jnp.asarray(fg_q.numpy()),
                                 jnp.asarray(bg_q.numpy()), jmask)
    np.testing.assert_allclose(np.asarray(got["fg_out"]),
                               want["fg_out"].numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["bg_out"]),
                               want["bg_out"].numpy(), atol=3e-5, rtol=1e-4)
    # attn maps: ref tucks heads into batch [(b h), 1, l]; ours are [b, h, 1, l]
    np.testing.assert_allclose(
        np.asarray(got["attn_fg"]).reshape(b * 8, 1, l),
        want["attn_fg"].numpy(), atol=1e-5)


def test_ada_embedding_parity():
    em = torch_oracle.load("ldm.modules.embedding_manager")
    torch.manual_seed(2)
    b, l, c, d_out = 2, 64, 64, 32
    K, r, n = 9, 12, 2
    dims = [c] * 16
    init_vecs = torch.randn(n, d_out)
    ref = em.AdaEmbedding(
        num_layers=16, num_vectors_per_subj_token=K, fg_emb_count=4,
        bg_emb_count=4, out_emb_dim=d_out, r=r, init_vecs=init_vecs,
        ca_infeat_dims=dims, has_bias=True, use_attn_pooler=True,
        token_string="z", device_type="cpu")
    ref.eval()
    with torch.no_grad():
        ref.bias.normal_(0, 0.05)

    cfg = ae.AdaEmbedderConfig(num_vectors=K, fg_emb_count=4, bg_emb_count=4,
                               out_emb_dim=d_out, rank=r, num_init_vecs=n,
                               ca_infeat_dims=tuple(dims))
    assert cfg.H == 2 and cfg.td(0) == int(0.5 * c)   # one type-2 emb
    params = ae.ada_from_torch(ref.state_dict(), cfg)

    comps, jcomps = _layer_attn(3, b, l, c, d_out)
    time_emb = torch.randn(b, 1280)
    probe = torch.randn(d_out)
    extra_mean = torch.randn(b, d_out)
    mask = (torch.rand(b, 1, 16, 16) > 0.3).float()

    # the reference wraps its forward in torch.autocast(enabled=True), which
    # on CPU lowers matmuls to bf16; neutralize it to compare exact math
    # (the op sequence is identical either way)
    import contextlib
    real_autocast = torch.autocast
    torch.autocast = lambda *a, **k: contextlib.nullcontext()
    try:
        wants = []
        for layer_idx in (1, 24):
            with torch.no_grad():
                wants.append(ref(
                    layer_idx, comps, time_emb, layer_subj_emb_probe=probe,
                    layer_static_extra_emb_mean=extra_mean, img_mask=mask))
    finally:
        torch.autocast = real_autocast

    for layer_idx, (want, want_pooled) in zip((1, 24), wants):
        got, pooled = ae.ada_forward(
            params, cfg, layer_idx, jcomps, jnp.asarray(time_emb.numpy()),
            jnp.asarray(probe.numpy()), jnp.asarray(extra_mean.numpy()),
            jnp.asarray(mask.numpy()))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=5e-5, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(pooled["bg_out"]),
                                   want_pooled["bg_out"].numpy(),
                                   atol=3e-5, rtol=1e-4)


def test_ada_zero_shot_basis():
    # zero-shot variant: per-sample basis vectors supplied at call time
    torch.manual_seed(4)
    b, l, c, d_out, K, r = 2, 64, 64, 32, 4, 6
    cfg = ae.AdaEmbedderConfig(num_vectors=K, fg_emb_count=2, bg_emb_count=2,
                               out_emb_dim=d_out, rank=r,
                               ca_infeat_dims=(c,) * 16, do_zero_shot=True)
    params = ae.ada_init(jax.random.PRNGKey(0), cfg)
    assert "basis_vecs" not in params and "bias" not in params
    _, jcomps = _layer_attn(5, b, l, c, d_out)
    zs = jnp.asarray(np.random.default_rng(0).normal(size=(b, K, r, d_out)),
                     jnp.float32)
    out, _ = ae.ada_forward(
        params, cfg, 1, jcomps, jnp.zeros((b, 1280)),
        jnp.zeros((d_out,)), jnp.zeros((b, d_out)), zs_basis_vecs=zs)
    assert out.shape == (b, K, d_out)
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError):
        ae.ada_forward(params, cfg, 1, jcomps, jnp.zeros((b, 1280)),
                       jnp.zeros((d_out,)), jnp.zeros((b, d_out)))


def test_reduce_cross_weights_masks_other_stream():
    cfg = ae.AdaEmbedderConfig(num_vectors=2, fg_emb_count=1, bg_emb_count=1,
                               out_emb_dim=16, rank=4, ca_infeat_dims=(32,) * 16)
    params = ae.ada_init(jax.random.PRNGKey(1), cfg)
    w = np.asarray(params["coeff_w"][0]).reshape(2, 4, -1)
    d = 32
    # fg emb (k=0): bg columns suppressed to <=1% of fg columns; bg emb mirror
    assert np.abs(w[0, :, d:2 * d]).mean() <= 0.011 * np.abs(w[0, :, :d]).mean()
    assert np.abs(w[1, :, :d]).mean() <= 0.011 * np.abs(w[1, :, d:2 * d]).mean()


def test_embedding3d_roundtrip():
    em = torch_oracle.load("ldm.modules.embedding_manager")
    init = torch.randn(16, 9, 8)
    ref = em.Embedding3d(num_layers=16, num_vectors_per_subj_token=9,
                         out_emb_dim=8, init_embedding=init)
    table = ae.embedding3d_init(16, 9, 8, jnp.asarray(init.numpy()))
    np.testing.assert_allclose(np.asarray(ae.embedding3d_lookup(table, 3)),
                               ref(3).detach().numpy())
    np.testing.assert_allclose(
        np.asarray(ae.embedding3d_lookup(table, 3, 2)),
        ref(3, 2).detach().numpy())
    new = jnp.ones((9, 8))
    table2 = ae.embedding3d_cache_layer(table, 5, new)
    np.testing.assert_allclose(np.asarray(ae.embedding3d_lookup(table2, 5)),
                               np.ones((9, 8)))
