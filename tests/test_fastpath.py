"""Sampler fast-path tests: ToMe token merging and DeepCache deep-feature
reuse inside the UNet (models/unet.py), CPU-runnable on the tiny config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaprompt_tpu.models import unet as junet

TINY = dict(model_channels=32, channel_mult=(1, 2, 4, 4), num_res_blocks=2,
            attention_ds=(1, 2, 4), num_heads=4, context_dim=16,
            in_channels=4, out_channels=4)
HW = 32


@pytest.fixture(scope="module")
def tiny():
    cfg = junet.UNetConfig(**TINY, use_checkpoint=False)
    params = junet.init_params(jax.random.PRNGKey(0), cfg)
    # zero_module()-style zero inits (proj_out / conv_out / out conv) would
    # make every eps identically zero — re-randomize them
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(7)
    leaves = [jnp.asarray(rng.normal(0, 0.02, l.shape), l.dtype)
              if not np.any(np.asarray(l)) else l for l in leaves]
    params = jax.tree.unflatten(treedef, leaves)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, HW, HW, 4)), jnp.float32)
    t = jnp.asarray([7, 345])
    ctx = jnp.asarray(rng.standard_normal((2, 77, TINY["context_dim"])),
                      jnp.float32)
    return cfg, params, x, t, ctx


# ---------------------------------------------------------------------------
# DeepCache
# ---------------------------------------------------------------------------

def test_deepcache_full_pass_matches_plain_forward(tiny):
    cfg, params, x, t, ctx = tiny
    eps_plain = junet.forward(params, x, t, ctx, cfg=cfg)
    eps_full, cache = junet.forward(params, x, t, ctx, cfg=cfg, cache_depth=3)
    np.testing.assert_allclose(np.asarray(eps_full), np.asarray(eps_plain),
                               rtol=1e-5, atol=1e-5)
    # cache = h entering output block (n_out - 3): the level-1 feature after
    # output block 8's upsample — full latent resolution, 2*model_channels
    assert cache.shape == (2, HW, HW, 2 * TINY["model_channels"])


def test_deepcache_shallow_pass_is_exact_on_same_step(tiny):
    """Shallow(x, t, cache(x, t)) == full(x, t): the shallow pass recomputes
    input blocks [0:j] and output blocks [n_out-j:] identically, so with the
    just-produced cache it must reproduce the full pass bit-for-bit."""
    cfg, params, x, t, ctx = tiny
    eps_full, cache = junet.forward(params, x, t, ctx, cfg=cfg, cache_depth=3)
    eps_shallow, cache2 = junet.forward(params, x, t, ctx, cfg=cfg,
                                        cache_depth=3, cache=cache)
    np.testing.assert_array_equal(np.asarray(eps_shallow), np.asarray(eps_full))
    np.testing.assert_array_equal(np.asarray(cache2), np.asarray(cache))


def test_deepcache_shallow_ignores_deep_context(tiny):
    """The shallow pass must not depend on anything below the cache point:
    perturbing x changes the shallow result, but a stale cache is used as-is."""
    cfg, params, x, t, ctx = tiny
    _, cache = junet.forward(params, x, t, ctx, cfg=cfg, cache_depth=3)
    eps_a, _ = junet.forward(params, x, t, ctx, cfg=cfg, cache_depth=3,
                             cache=cache)
    eps_b, _ = junet.forward(params, x + 0.1, t, ctx, cfg=cfg, cache_depth=3,
                             cache=cache)
    assert not np.allclose(np.asarray(eps_a), np.asarray(eps_b))


@pytest.mark.parametrize("depth", [1, 3, 5])
def test_deepcache_depths_compile_and_roundtrip(tiny, depth):
    cfg, params, x, t, ctx = tiny
    eps_full, cache = junet.forward(params, x, t, ctx, cfg=cfg,
                                    cache_depth=depth)
    eps_shallow, _ = junet.forward(params, x, t, ctx, cfg=cfg,
                                   cache_depth=depth, cache=cache)
    np.testing.assert_allclose(np.asarray(eps_shallow), np.asarray(eps_full),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# ToMe in the UNet
# ---------------------------------------------------------------------------

def test_tome_high_threshold_is_identity(tiny):
    cfg, params, x, t, ctx = tiny
    base = junet.forward(params, x, t, ctx, cfg=cfg)
    cfg_t = dataclasses.replace(cfg, tome_ratio=0.5,
                                tome_min_tokens=10 ** 9)
    out = junet.forward(params, x, t, ctx, cfg=cfg_t)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_tome_active_changes_output_but_stays_close(tiny):
    cfg, params, x, t, ctx = tiny
    base = junet.forward(params, x, t, ctx, cfg=cfg)
    # tiny model: 32x32 latents -> 1024 tokens at ds=1
    cfg_t = dataclasses.replace(cfg, tome_ratio=0.5, tome_min_tokens=1024,
                                tome_attn=True, tome_mlp=True)
    out = junet.forward(params, x, t, ctx, cfg=cfg_t)
    a, b = np.asarray(out), np.asarray(base)
    assert not np.array_equal(a, b)
    # the approximation must stay in the same numeric regime
    rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
    assert rel < 0.5, rel


def test_tome_disabled_on_capture_path(tiny):
    """Distill-capture iterations must never merge tokens (attn maps feed
    the fg/bg regularizers at full resolution)."""
    cfg, params, x, t, ctx = tiny
    cfg_t = dataclasses.replace(cfg, tome_ratio=0.5, tome_min_tokens=256)
    eps, caps = junet.forward(params, x, t, ctx, cfg=cfg_t, capture_ca=True)
    eps0, caps0 = junet.forward(params, x, t, ctx, cfg=cfg, capture_ca=True)
    np.testing.assert_array_equal(np.asarray(eps), np.asarray(eps0))
    for li in caps["attn"]:
        assert caps["attn"][li].shape == caps0["attn"][li].shape


# ---------------------------------------------------------------------------
# ddim_sample_fast (sampling/ddim.py) — segmented DeepCache/CFG-tail loop
# ---------------------------------------------------------------------------

from adaprompt_tpu.sampling import ddim as jddim
from adaprompt_tpu.sampling.schedule import SD15_SCHEDULE, make_ddim_params

_B = 2  # cond batch for the fake models


def _sign_for(n):
    """+1 on cond rows, -1 on uncond rows — mimics the closed-over context
    of the real pipeline (cond first, ddim.py CFG order)."""
    n_cond = _B if n == 2 * _B else n
    return jnp.where(jnp.arange(n) < n_cond, 1.0, -1.0).astype(jnp.float32)


def _fake_full(x, t):
    s = _sign_for(x.shape[0]).reshape(-1, 1, 1, 1)
    eps = 0.05 * x + 0.001 * t.reshape(-1, 1, 1, 1).astype(jnp.float32) + 0.03 * s
    return eps, 0.5 * x  # "deep cache" carries the step input


def _fake_shallow(x, t, cache):
    s = _sign_for(x.shape[0]).reshape(-1, 1, 1, 1)
    return (0.05 * x + 0.001 * t.reshape(-1, 1, 1, 1).astype(jnp.float32)
            + 0.03 * s + 0.02 * cache)


def _oracle_fast(x_T, steps, guidance, interval, tail_frac):
    """Python-loop replica of ddim_sample_fast's segment/group structure."""
    ts, alphas, aprev, _ = make_ddim_params(SD15_SCHEDULE, steps)
    order = np.arange(steps)[::-1]
    ts, alphas, aprev = ts[order], alphas[order], aprev[order]
    g = jddim.guidance_schedule(steps, guidance).copy()
    n_cfg = max(min(int(round(steps * (1.0 - tail_frac))), steps), 0)
    if tail_frac > 0:
        g[n_cfg:] = 1.0

    def full(xx, tt):
        s = np.where(np.arange(xx.shape[0]) < (_B if xx.shape[0] == 2 * _B else xx.shape[0]),
                     1.0, -1.0).astype(np.float32).reshape(-1, 1, 1, 1)
        return (0.05 * xx + 0.001 * np.float32(tt) + 0.03 * s,
                np.float32(0.5) * xx)

    def shallow(xx, tt, cache):
        s = np.where(np.arange(xx.shape[0]) < (_B if xx.shape[0] == 2 * _B else xx.shape[0]),
                     1.0, -1.0).astype(np.float32).reshape(-1, 1, 1, 1)
        return (0.05 * xx + 0.001 * np.float32(tt) + 0.03 * s
                + np.float32(0.02) * cache)

    x = np.asarray(x_T, np.float32)

    def seg(x, idxs, use_cfg):
        n = len(idxs)
        if n == 0:
            return x
        cache = None
        for j, i in enumerate(idxs):
            # round-5 fastloop semantics: the interval applies UNIFORMLY
            # (every interval-th step of the segment runs the full model,
            # remainder included) — one lax.scan + cond per segment, no
            # separate remainder executables
            is_full = j % max(int(interval), 1) == 0
            xin = np.concatenate([x, x], 0) if use_cfg else x
            if is_full:
                e_all, cache = full(xin, ts[i])
            else:
                e_all = shallow(xin, ts[i], cache)
            if use_cfg:
                e_c, e_u = np.split(e_all, 2, axis=0)
                e_t = e_u + np.float32(g[i]) * (e_c - e_u)
            else:
                e_t = e_all
            at, ap = np.float32(alphas[i]), np.float32(aprev[i])
            pred_x0 = (x - np.sqrt(np.float32(1) - at) * e_t) / np.sqrt(at)
            x = np.sqrt(ap) * pred_x0 + np.sqrt(np.float32(1) - ap) * e_t
        return x

    x = seg(x, list(range(n_cfg)), True)
    x = seg(x, list(range(n_cfg, steps)), False)
    return x


def test_fast_sampler_disabled_matches_exact():
    rng = np.random.default_rng(0)
    x_T = jnp.asarray(rng.standard_normal((_B, 8, 8, 4)), jnp.float32)
    exact = jddim.ddim_sample(lambda x, t: _fake_full(x, t)[0], x_T,
                              num_steps=10, guidance_scale=(4.0, 1.0))
    fast = jddim.ddim_sample_fast(_fake_full, _fake_shallow, x_T,
                                  num_steps=10, guidance_scale=(4.0, 1.0),
                                  cache_interval=1, cfg_tail_frac=0.0)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("steps,interval,tail", [
    (10, 3, 0.3),   # both segments, remainder steps in each
    (7, 3, 0.3),    # CFG seg 5 (1 group + rem 2), tail 2 (g_cnt==0 path)
    (6, 2, 0.0),    # no tail segment
    (5, 4, 1.0),    # no CFG segment at all
])
def test_fast_sampler_matches_python_oracle(steps, interval, tail):
    rng = np.random.default_rng(steps * 100 + interval)
    x_T = rng.standard_normal((_B, 8, 8, 4)).astype(np.float32)
    got = jddim.ddim_sample_fast(_fake_full, _fake_shallow, jnp.asarray(x_T),
                                 num_steps=steps, guidance_scale=(4.0, 1.0),
                                 cache_interval=interval, cfg_tail_frac=tail)
    want = _oracle_fast(x_T, steps, (4.0, 1.0), interval, tail)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_cfg_tail_last_step_is_free():
    """With guidance annealed 4->1, the final step's scale is exactly 1, so
    dropping its uncond half changes nothing: tail_frac=1/S == exact."""
    steps = 25
    rng = np.random.default_rng(3)
    x_T = jnp.asarray(rng.standard_normal((_B, 8, 8, 4)), jnp.float32)
    exact = jddim.ddim_sample(lambda x, t: _fake_full(x, t)[0], x_T,
                              num_steps=steps, guidance_scale=(4.0, 1.0))
    fast = jddim.ddim_sample_fast(_fake_full, _fake_shallow, x_T,
                                  num_steps=steps, guidance_scale=(4.0, 1.0),
                                  cache_interval=1, cfg_tail_frac=1.0 / steps)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Pipeline fast path (pipeline.FastConfig)
# ---------------------------------------------------------------------------

def test_pipeline_fast_path_e2e():
    from tests.test_pipeline import tiny_pipeline
    from adaprompt_tpu import pipeline as pl
    pipe = tiny_pipeline()
    fast = pl.FastConfig(tome_ratio=0.0, cache_interval=2, cache_depth=2,
                         cfg_tail_frac=0.3)
    imgs = pipe.generate(["a photo of a cat"], num_steps=6, height=64,
                         width=64, seed=1, fast=fast)
    assert imgs.shape == (1, 64, 64, 3) and imgs.dtype == np.uint8
    assert imgs.std() > 0


def test_pipeline_fast_noop_matches_exact():
    from tests.test_pipeline import tiny_pipeline
    from adaprompt_tpu import pipeline as pl
    pipe = tiny_pipeline()
    fast = pl.FastConfig(tome_ratio=0.0, cache_interval=1, cache_depth=1,
                         cfg_tail_frac=0.0)
    a = pipe.generate(["a cat"], num_steps=4, height=64, width=64, seed=2)
    b = pipe.generate(["a cat"], num_steps=4, height=64, width=64, seed=2,
                      fast=fast)
    np.testing.assert_allclose(a.astype(np.int32), b.astype(np.int32), atol=1)


@pytest.mark.parametrize("steps,interval,tail", [
    (10, 3, 0.3), (7, 3, 0.3), (20, 4, 0.35),
])
def test_fast_sampler_group_policy_matches_oracle(steps, interval, tail,
                                                  monkeypatch):
    """ADAPROMPT_FASTLOOP_COND=group (group scan + remainder executables)
    must be numerically IDENTICAL to the cond-scan default — the policy is
    a pure loop-structure choice (round-5 A/B, docs/PERF.md)."""
    from adaprompt_tpu.sampling import fastloop
    monkeypatch.setattr(fastloop, "_COND_POLICY", "group")
    rng = np.random.default_rng(steps * 100 + interval)
    x_T = rng.standard_normal((_B, 8, 8, 4)).astype(np.float32)
    got = jddim.ddim_sample_fast(_fake_full, _fake_shallow, jnp.asarray(x_T),
                                 num_steps=steps, guidance_scale=(4.0, 1.0),
                                 cache_interval=interval, cfg_tail_frac=tail)
    want = _oracle_fast(x_T, steps, (4.0, 1.0), interval, tail)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
