"""Compositional step tests on tiny models."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from adaprompt_tpu.models import unet as unet_mod, vae as vae_mod
from adaprompt_tpu.train import compos_step as cs
from adaprompt_tpu.train import steps as steps_mod


def test_scale_into_canvas_identity_and_shrink():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    same = cs.scale_into_canvas(x, 1.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x), atol=1e-5)
    small = cs.scale_into_canvas(x, 0.5)
    # corners become zero padding
    assert float(jnp.abs(small[0, 0, 0]).sum()) == 0.0
    assert float(jnp.abs(small[0, 4, 4]).sum()) > 0.0


def test_init_x_with_fg():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    fg = jnp.zeros((1, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)
    x2, fg2, ffg2 = cs.init_x_with_fg_from_training_image(
        x, fg, fg, jax.random.PRNGKey(0), fg_rand_scale=0.8)
    assert x2.shape == x.shape and fg2.shape == fg.shape
    # scaled fg area is smaller
    assert float(ffg2.sum()) <= float(fg.sum()) + 1e-3


def test_pick_fg_rand_scale_ranges():
    rng = np.random.default_rng(2)
    small = np.zeros((16, 16))
    small[:2, :2] = 1  # 1.5% fg
    s = cs.pick_fg_rand_scale(small, rng)
    assert 0.7 - 1e-6 <= s <= 1.0
    big = np.ones((16, 16)) * 0.5  # 50% "fg"
    big = (np.random.default_rng(0).random((16, 16)) < 0.5).astype(float)
    s2 = cs.pick_fg_rand_scale(big, rng)
    assert s2 <= 1.0


@pytest.fixture(scope="module")
def tiny_models():
    ucfg = unet_mod.UNetConfig(model_channels=32, channel_mult=(1, 2, 4, 4),
                               num_res_blocks=2, attention_ds=(1, 2, 4),
                               num_heads=4, context_dim=48, use_checkpoint=False)
    vcfg = vae_mod.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    unet_params = unet_mod.init_params(k1, ucfg)
    # de-zero output convs so phases produce signal
    leaves, treedef = jax.tree.flatten(unet_params)
    rngs = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l if l.ndim < 2 or jnp.abs(l).sum() > 0 else jax.random.normal(r, l.shape) * 0.02
              for l, r in zip(leaves, rngs)]
    unet_params = jax.tree.unflatten(treedef, leaves)
    mp = {"unet": unet_params, "vae": vae_mod.init_params(k2, vcfg)}
    return cs.ComposModels(unet_cfg=ucfg, vae_cfg=vcfg), mp


def test_filter_phase(tiny_models):
    models, mp = tiny_models
    phase = cs.make_filter_phase(models, cfg_scale=2.0,
                                 compute_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    n = 4  # 2 candidates x 2 (subj, mix)
    ctx = jnp.asarray(rng.standard_normal((16, n, 11, 48)), jnp.float32)
    un = jnp.asarray(rng.standard_normal((1, n, 11, 48)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((n, 16, 16, 4)), jnp.float32)
    t = jnp.asarray([900] * n)
    noise = jnp.asarray(rng.standard_normal((n, 16, 16, 4)), jnp.float32)
    x_recon, imgs = phase(mp, ctx, ctx, un, x0, t, noise)
    assert x_recon.shape == (n, 16, 16, 4)
    assert imgs.shape == (n, 32, 32, 3)


def test_compos_train_phase_and_cache(tiny_models):
    models, mp = tiny_models
    optimizer = optax.adam(1e-3)
    subj_pos = [4, 5, 6]

    # trainable: a simple projection producing the contexts (stand-in for the
    # SubjBasisGenerator + conditioner in the real trainer)
    rng = np.random.default_rng(4)
    base_ctx = jnp.asarray(rng.standard_normal((16, 4, 11, 48)), jnp.float32)

    def context_fn(trainable, mp_, batch):
        ctx4 = base_ctx + trainable["delta"][None, None, None]
        static_embs = ctx4.transpose(1, 0, 2, 3)
        return {"ctx4": ctx4, "static_embs": static_embs,
                "prompt_emb_mask": None, "subj_pos": subj_pos, "bg_pos": None}

    phase = cs.make_compos_train_phase(optimizer, models, context_fn,
                                       compute_dtype=jnp.float32)
    trainable = {"delta": jnp.zeros((48,))}
    state = steps_mod.create_train_state(trainable, optimizer)
    batch = {
        "x_start": jnp.asarray(rng.standard_normal((4, 16, 16, 4)), jnp.float32),
        "t": jnp.asarray([850, 850, 850, 850]),
        "noise": jnp.asarray(rng.standard_normal((4, 16, 16, 4)), jnp.float32),
        "fg_mask": None,
    }
    state2, metrics, x_recon = phase(state, mp, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss_compos"]))
    assert x_recon.shape == (4, 16, 16, 4)
    assert float(metrics["grad_norm"]) > 0

    cache = cs.CachedInits(1000)
    cache.put("alice", np.asarray(x_recon), np.asarray(batch["t"]))
    assert cache.has("alice")
    x_start, t = cache.take("alice", np.random.default_rng(0))
    assert not cache.has("alice")
    assert (t <= 850 - 150).all() and (t >= 0).all()
