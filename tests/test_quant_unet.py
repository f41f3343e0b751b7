"""Quantized (w8a8 int8) UNet sampler path vs the float path.

The int8 path is OPT-IN (UNetConfig.quant="int8" / ADAPROMPT_QUANT=int8)
and forward-only; these tests bound its drift against the float forward
on a tiny UNet and check training configs are unaffected by default.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.models import unet as unet_mod


def _tiny(quant=None):
    return unet_mod.UNetConfig(model_channels=32, channel_mult=(1, 2),
                               num_res_blocks=1, attention_ds=(1, 2),
                               num_heads=4, context_dim=64,
                               use_checkpoint=False, quant=quant)


def _denoise_zero_inits(params):
    """init_params zero-inits the output convs (LDM 'zero module'
    convention), which makes the whole eps exactly 0 — perturb every
    param so the comparison actually exercises the network."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    return jax.tree.unflatten(treedef, leaves)


def test_int8_forward_close_to_float():
    cfg = _tiny()
    qcfg = _tiny(quant="int8")
    params = _denoise_zero_inits(unet_mod.init_params(jax.random.PRNGKey(0), cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([500, 20], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 64), jnp.float32)

    eps = unet_mod.forward(params, x, t, ctx, cfg=cfg)
    eps_q = unet_mod.forward(params, x, t, ctx, cfg=qcfg)
    assert eps_q.shape == eps.shape
    err = np.linalg.norm(np.asarray(eps_q - eps)) / np.linalg.norm(np.asarray(eps))
    # per-layer int8 error ~1%; through the residual UNet stays small.
    # After the round-3 re-composition, quant="int8" only switches the
    # Pallas-fused FF/cross kernels (projections stay bf16 — measured
    # net-negative as XLA int8, docs/PERF.md), so on the CPU backend
    # (pallas off) the two forwards are bit-identical: err may be 0.
    assert err < 0.05, err


def test_quant_default_off():
    assert unet_mod.UNetConfig().quant is None


def test_int8_with_precomputed_cross_kv():
    # the sampler path (hoisted cross K/V) must compose with quant
    qcfg = _tiny(quant="int8")
    params = unet_mod.init_params(jax.random.PRNGKey(0), qcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([500, 20], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 77, 64), jnp.float32)
    kv = unet_mod.precompute_cross_kv(params, ctx, cfg=qcfg)
    eps_kv = unet_mod.forward(params, x, t, ctx, cross_kv=kv, cfg=qcfg)
    eps = unet_mod.forward(params, x, t, ctx, cfg=qcfg)
    np.testing.assert_allclose(np.asarray(eps_kv), np.asarray(eps),
                               atol=5e-3, rtol=0)
