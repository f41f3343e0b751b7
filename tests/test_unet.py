"""Parity tests: adaprompt_tpu.models.unet vs the reference UNetModel
(/root/reference/ldm/modules/diffusionmodules/openaimodel.py)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from adaprompt_tpu.models import unet as junet

import torch_oracle

# Same 25-layer skeleton as SD-1.5 (the reference hardcodes the CA layer map
# for it) but 10x narrower.
TINY = dict(model_channels=32, channel_mult=(1, 2, 4, 4), num_res_blocks=2,
            attention_ds=(1, 2, 4), num_heads=4, context_dim=16,
            in_channels=4, out_channels=4)
HW = 32  # latent size: ds8 -> 4x4 at the middle block


def _extra_info(**over):
    info = dict(use_layerwise_context=False, iter_type="normal_recon",
                is_training=False, capture_distill_attn=False,
                use_conv_attn_kernel_size=-1, placeholder2indices=None,
                img_mask=None, apply_compel_cfg_prob=0, empty_context=None,
                debug_attn=False)
    info.update(over)
    return info


@pytest.fixture(scope="module")
def tiny_pair():
    om = torch_oracle.load("ldm.modules.diffusionmodules.openaimodel")
    torch.manual_seed(0)
    ref = om.UNetModel(
        image_size=HW, in_channels=4, out_channels=4,
        model_channels=TINY["model_channels"],
        attention_resolutions=list(TINY["attention_ds"]),
        num_res_blocks=TINY["num_res_blocks"],
        channel_mult=list(TINY["channel_mult"]),
        num_heads=TINY["num_heads"], use_spatial_transformer=True,
        transformer_depth=1, context_dim=TINY["context_dim"],
        use_checkpoint=False, legacy=False).eval()
    # zero_module() zero-inits proj_out / out convs, which would make parity
    # vacuous (context would have no effect) — re-randomize them.
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    cfg = junet.UNetConfig(**TINY, use_checkpoint=False)
    params = junet.from_torch(ref.state_dict(), cfg)
    return ref, cfg, params


def _inputs(b=2, hw=HW, ctx_dim=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, 4, hw, hw)).astype(np.float32)
    t = np.array([7, 345][:b], dtype=np.int64)
    ctx = rng.standard_normal((b, 77, ctx_dim)).astype(np.float32)
    return x, t, ctx


def test_forward_parity_layerwise(tiny_pair):
    """16 distinct per-layer contexts, fed the reference way ([16*B,77,D]
    tucked into the batch dim) vs ours ([16,B,77,D] explicit)."""
    ref, cfg, params = tiny_pair
    x, t, _ = _inputs()
    rng = np.random.default_rng(11)
    ctx_l = rng.standard_normal((16, 2, 77, TINY["context_dim"])).astype(np.float32)
    # reference layout: [B, 16, S, D] flattened to [16*B, S, D] batch-major
    ctx_ref = ctx_l.transpose(1, 0, 2, 3).reshape(2 * 16, 77, TINY["context_dim"])
    with torch.no_grad():
        out = ref(torch.tensor(x), timesteps=torch.tensor(t),
                  context=torch.tensor(ctx_ref),
                  extra_info=_extra_info(use_layerwise_context=True))
    got = junet.forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t), jnp.asarray(ctx_l), cfg=cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               out.numpy(), atol=2e-4, rtol=1e-3)


def test_img_mask_parity(tiny_pair):
    """img_mask restricts self-attention keys (attention.py:223-232)."""
    ref, cfg, params = tiny_pair
    x, t, ctx = _inputs(seed=3)
    rng = np.random.default_rng(4)
    mask = (rng.random((2, 1, HW, HW)) > 0.3).astype(np.float32)
    ctx_ref = np.tile(ctx[:, None], (1, 16, 1, 1)).reshape(2 * 16, 77, TINY["context_dim"])
    with torch.no_grad():
        out = ref(torch.tensor(x), timesteps=torch.tensor(t),
                  context=torch.tensor(ctx_ref),
                  extra_info=_extra_info(use_layerwise_context=True,
                                         img_mask=torch.tensor(mask)))
    got = junet.forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t), jnp.asarray(ctx),
                        img_mask=jnp.asarray(mask.transpose(0, 2, 3, 1)), cfg=cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               out.numpy(), atol=2e-4, rtol=1e-3)


def test_layerwise_context_self_consistency(tiny_pair):
    """L=16 identical per-layer contexts must equal the shared-context path,
    and genuinely different per-layer contexts must change the output."""
    _, cfg, params = tiny_pair
    x, t, ctx = _inputs(seed=5)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    shared = junet.forward(params, xj, jnp.asarray(t), jnp.asarray(ctx), cfg=cfg)
    tiled = jnp.tile(jnp.asarray(ctx)[None], (16, 1, 1, 1))
    layerwise = junet.forward(params, xj, jnp.asarray(t), tiled, cfg=cfg)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(layerwise), atol=1e-5)

    rng = np.random.default_rng(6)
    varied = tiled.at[3].set(jnp.asarray(rng.standard_normal(ctx.shape), dtype=jnp.float32))
    out_varied = junet.forward(params, xj, jnp.asarray(t), varied, cfg=cfg)
    assert not np.allclose(np.asarray(shared), np.asarray(out_varied), atol=1e-4)


def test_vk_context_split(tiny_pair):
    """Separate V/K contexts ('mix_hijk') reduce to the shared path when
    equal, and differ when not."""
    _, cfg, params = tiny_pair
    x, t, ctx = _inputs(seed=7)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    ctxj = jnp.asarray(ctx)
    base = junet.forward(params, xj, jnp.asarray(t), ctxj, context_k=ctxj, cfg=cfg)
    ref = junet.forward(params, xj, jnp.asarray(t), ctxj, cfg=cfg)
    np.testing.assert_allclose(np.asarray(base), np.asarray(ref), atol=1e-6)

    rng = np.random.default_rng(8)
    k2 = jnp.asarray(rng.standard_normal(ctx.shape), dtype=jnp.float32)
    out2 = junet.forward(params, xj, jnp.asarray(t), ctxj, context_k=k2, cfg=cfg)
    assert not np.allclose(np.asarray(base), np.asarray(out2), atol=1e-4)


def test_capture_ca_activations(tiny_pair):
    """Activation capture returns q/attn/attnscore/outfeat per distill layer
    present in this tiny plan."""
    ref, cfg, params = tiny_pair
    x, t, ctx = _inputs(seed=9)
    eps, acts = junet.forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              jnp.asarray(t), jnp.asarray(ctx),
                              capture_ca=True, cfg=cfg)
    # tiny plan: CA at layers 1, 3 (inputs), 4 (middle), 5..8 where attn
    present = set(acts["attn"].keys())
    assert present, "no distill-layer activations captured"
    for key in ("outfeat", "attn", "attnscore", "q"):
        assert set(acts[key].keys()) == present
    for li in present:
        b, h, n, s = acts["attn"][li].shape
        assert h == cfg.num_heads and s == 77


def test_timestep_embedding_parity():
    util = torch_oracle.load("ldm.modules.diffusionmodules.util")
    t = torch.tensor([0, 1, 10, 999])
    ref = util.timestep_embedding(t, 320).numpy()
    got = junet.timestep_embedding(jnp.asarray(t.numpy()), 320)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_precompute_cross_kv_equivalence(tiny_pair):
    """Hoisted K/V projections (sampler-loop optimization) must reproduce
    the in-graph projections exactly, for shared and layerwise contexts."""
    _, cfg, params = tiny_pair
    x, t, ctx = _inputs(seed=11)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    ctxj = jnp.asarray(ctx)
    base = junet.forward(params, xj, jnp.asarray(t), ctxj, cfg=cfg)
    kv = junet.precompute_cross_kv(params, ctxj, cfg=cfg)
    got = junet.forward(params, xj, jnp.asarray(t), ctxj, cross_kv=kv, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-6)

    rng = np.random.default_rng(12)
    lw = jnp.asarray(rng.standard_normal((16,) + ctx.shape), jnp.float32)
    base_lw = junet.forward(params, xj, jnp.asarray(t), lw, cfg=cfg)
    kv_lw = junet.precompute_cross_kv(params, lw, cfg=cfg)
    got_lw = junet.forward(params, xj, jnp.asarray(t), lw, cross_kv=kv_lw,
                           cfg=cfg)
    np.testing.assert_allclose(np.asarray(got_lw), np.asarray(base_lw),
                               atol=1e-6)


def test_conv_attn_forward_parity(tiny_pair):
    """Subject-row conv-attn replacement inside the full UNet forward
    (attention.py:208-216; openaimodel set_cross_attn_flags
    use_conv_attn_kernel_size) vs the reference with the same flags."""
    ref, cfg, params = tiny_pair
    x, t, ctx = _inputs(seed=21)
    ks = 2
    m = ks * ks
    pos = np.stack([np.arange(5, 5 + m), np.arange(5, 5 + m)])  # [B, M]
    indices = (torch.tensor(np.repeat(np.arange(2), m)),
               torch.tensor(pos.reshape(-1)))
    ctx_ref = np.tile(ctx[:, None], (1, 16, 1, 1)).reshape(
        2 * 16, 77, TINY["context_dim"])
    with torch.no_grad():
        out = ref(torch.tensor(x), timesteps=torch.tensor(t),
                  context=torch.tensor(ctx_ref),
                  extra_info=_extra_info(use_layerwise_context=True,
                                         use_conv_attn_kernel_size=ks,
                                         placeholder2indices={"z": indices}))
    got = junet.forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t), jnp.asarray(ctx),
                        conv_attn={"subj_pos": jnp.asarray(pos),
                                   "kernel_size": ks, "mix_weight": 1.0},
                        cfg=cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               out.numpy(), atol=3e-4, rtol=1e-3)


def test_use_checkpoint_grad_parity(tiny_pair):
    """Block-level remat (use_checkpoint) must not change forward values or
    gradients — only memory. Also covers grads through captured activations."""
    _, cfg, params = tiny_pair
    import dataclasses as dc
    cfg_ck = dc.replace(cfg, use_checkpoint=True)
    x, t, ctx = _inputs(seed=22)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    ctxj = jnp.asarray(ctx)

    def loss(p, c):
        eps, caps = junet.forward(p, xj, jnp.asarray(t), ctxj, cfg=c,
                                  capture_ca=True)
        reg = sum(jnp.sum(v ** 2) for v in caps["attnscore"].values())
        return jnp.sum(eps ** 2) * 1e-2 + reg * 1e-6

    g_plain = jax.grad(lambda p: loss(p, cfg))(params)
    g_ck = jax.grad(lambda p: loss(p, cfg_ck))(params)
    flat_p, _ = jax.tree_util.tree_flatten(g_plain)
    flat_c, _ = jax.tree_util.tree_flatten(g_ck)
    for a, b in zip(flat_p, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
