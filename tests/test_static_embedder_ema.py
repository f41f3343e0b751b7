"""Parity/behavior tests: legacy StaticLayerwiseEmbedding, EMA, ProdigyAdamW."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import optax

from adaprompt_tpu.adaface import static_embedder as se
from adaprompt_tpu.train import ema as ema_mod
from adaprompt_tpu.train.prodigy import prodigy_adamw

import torch_oracle


def test_static_embedder_forward_parity():
    em = torch_oracle.load("ldm.modules.embedding_manager")
    torch.manual_seed(0)
    init_vecs = torch.randn(2, 32)
    ref = em.StaticLayerwiseEmbedding(
        num_layers=16, num_vectors_per_subj_token=3, out_emb_dim=32, r=6,
        init_vecs=init_vecs, init_vec_weights=torch.tensor([0.6, 0.4]),
        has_bias=True, token_string="z", do_zero_shot=False,
        device_type="cpu")
    with torch.no_grad():
        ref.bias.normal_(0, 0.1)
        want = ref().numpy()

    cfg = se.StaticEmbedderConfig(num_layers=16, num_vectors=3, out_emb_dim=32,
                                  rank=6, num_init_vecs=2)
    params = se.from_torch(ref.state_dict(), cfg)
    got = se.forward(params, cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_ema_matches_litema():
    em = torch_oracle.load("ldm.modules.ema")
    torch.manual_seed(1)
    model = torch.nn.Linear(4, 3)
    lit = em.LitEma(model, decay=0.99)
    # np.array copies: jnp.asarray on CPU can zero-copy-alias the torch
    # tensor's memory, which the in-place updates below would mutate
    params = {"weight": jnp.array(np.array(model.weight.detach().numpy())),
              "bias": jnp.array(np.array(model.bias.detach().numpy()))}
    state = ema_mod.ema_init(params)
    for i in range(3):
        with torch.no_grad():
            model.weight += 0.1
            model.bias -= 0.05
        lit(model)
        params = {"weight": params["weight"] + 0.1, "bias": params["bias"] - 0.05}
        state = ema_mod.ema_update(state, params, decay=0.99)
    shadow_w = dict(lit.named_buffers()).get("weight")
    # LitEma stores shadows as parameters named without dots
    shadow = {n: p.detach().numpy() for n, p in lit.named_parameters()}
    np.testing.assert_allclose(np.asarray(state.shadow["weight"]),
                               shadow["weight"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.shadow["bias"]),
                               shadow["bias"], atol=1e-6)


def test_prodigy_adamw_runs():
    tx = prodigy_adamw(max_steps=100, base_lr=1e-3)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    for _ in range(30):
        g = {"w": params["w"] * 0.5}
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    assert np.isfinite(np.asarray(params["w"])).all()
    # after 30 steps the D estimate has grown and params moved measurably
    assert not np.allclose(np.asarray(params["w"]), 1.0, atol=1e-4)
