"""DPM-Solver++(2M) sampler tests (sampling/dpm.py).

Properties tested (no torch oracle exists — the reference has no
DPM-Solver; these are math invariants of the solver itself):
  * first order == deterministic DDIM step-for-step (algebraic identity),
  * 2M converges to the shared probability-flow-ODE solution FASTER than
    DDIM: at equal (small) step counts its error vs a fine-grid reference
    is smaller,
  * pipeline/CLI integration (sampler="dpmpp").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaprompt_tpu.sampling import ddim, dpm


def smooth_eps_model(b):
    """A smooth, Lipschitz eps(x, t) so the PF-ODE has a well-defined
    solution both samplers converge to."""

    def model(x, t):
        tt = t.reshape(-1, 1, 1, 1).astype(jnp.float32) / 1000.0
        return jnp.tanh(x) * (0.4 + 0.4 * tt) + 0.2 * jnp.sin(3.0 * tt) - 0.1 * x
    return model


def test_order1_equals_ddim():
    key = jax.random.PRNGKey(0)
    x_T = jax.random.normal(key, (2, 4, 4, 4), jnp.float32)
    model = smooth_eps_model(2)
    for steps in (1, 2, 7, 20):
        a = ddim.ddim_sample(model, x_T, num_steps=steps, use_cfg=False)
        b = dpm.dpmpp_sample(model, x_T, num_steps=steps, use_cfg=False,
                             solver_order=1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_2m_higher_order_convergence():
    # NESTED timestep grids: the uniform discretization's START point moves
    # with num_steps (make_ddim_timesteps), which would confound the
    # comparison with different initial-value problems — here every grid
    # shares the exact endpoints [1, 999], so all runs solve the SAME ODE.
    key = jax.random.PRNGKey(1)
    x_T = jax.random.normal(key, (2, 4, 4, 4), jnp.float32)
    model = smooth_eps_model(2)
    fine = np.round(np.linspace(1, 999, 481)).astype(np.int64)
    ref = np.asarray(ddim.ddim_sample(model, x_T, num_steps=0,
                                      timesteps=fine, use_cfg=False))

    def err(x):
        return float(np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref))

    for k in (48, 30, 20):          # 11 / 17 / 25 steps, same endpoints
        coarse = fine[::k]
        assert coarse[-1] == fine[-1]
        e_ddim = err(ddim.ddim_sample(model, x_T, num_steps=0,
                                      timesteps=coarse, use_cfg=False))
        e_dpm = err(dpm.dpmpp_sample(model, x_T, num_steps=0,
                                     timesteps=coarse, use_cfg=False))
        # second order must beat first order clearly at equal step count
        assert e_dpm < 0.6 * e_ddim, (k, e_dpm, e_ddim)


def test_cfg_wiring_matches_manual_combination():
    # with a model whose cond/uncond halves differ, the CFG-combined eps at
    # guidance==1 must equal the cond half alone
    key = jax.random.PRNGKey(2)
    x_T = jax.random.normal(key, (1, 4, 4, 4), jnp.float32)
    base = smooth_eps_model(1)

    def doubled(x, t):
        c, u = jnp.split(x, 2, axis=0)
        tc, tu = jnp.split(t, 2, axis=0)
        return jnp.concatenate([base(c, tc), base(u, tu) * 0.5], axis=0)

    out_cfg1 = dpm.dpmpp_sample(doubled, x_T, num_steps=8,
                                guidance_scale=(1.0, 1.0), use_cfg=True)
    out_plain = dpm.dpmpp_sample(base, x_T, num_steps=8, use_cfg=False)
    np.testing.assert_allclose(np.asarray(out_cfg1), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)


def test_bad_solver_order():
    with pytest.raises(ValueError):
        dpm.dpmpp_sample(smooth_eps_model(1), jnp.zeros((1, 4, 4, 4)),
                         num_steps=4, solver_order=3)


def test_pipeline_dpmpp_generate():
    from tests.test_pipeline import tiny_pipeline
    pipe = tiny_pipeline()
    imgs = pipe.generate(["a photo of a cat"], num_steps=3, sampler="dpmpp",
                         height=64, width=64, seed=5)
    assert imgs.shape == (1, 64, 64, 3)
    assert imgs.dtype == np.uint8
    assert imgs.std() > 0
    # unknown sampler must be rejected
    with pytest.raises(ValueError):
        pipe.generate(["x"], num_steps=2, sampler="plms",
                      height=64, width=64)


# ---------------------------------------------------------------------------
# dpmpp_sample_fast — the composed serving stack (sampling/fastloop.py)
# ---------------------------------------------------------------------------

def _fake_full(x, t):
    """Fake eps model with a cond/uncond asymmetry and a deep cache, shared
    shape-contract with the pipeline's model_full (see test_fastpath)."""
    n = x.shape[0]
    n_cond = 2 if n == 4 else n
    s = jnp.where(jnp.arange(n) < n_cond, 1.0, -1.0).astype(jnp.float32)
    s = s.reshape(-1, 1, 1, 1)
    eps = 0.05 * x + 0.001 * t.reshape(-1, 1, 1, 1).astype(jnp.float32) + 0.03 * s
    return eps, 0.5 * x


def _fake_shallow(x, t, cache):
    n = x.shape[0]
    n_cond = 2 if n == 4 else n
    s = jnp.where(jnp.arange(n) < n_cond, 1.0, -1.0).astype(jnp.float32)
    s = s.reshape(-1, 1, 1, 1)
    return (0.05 * x + 0.001 * t.reshape(-1, 1, 1, 1).astype(jnp.float32)
            + 0.03 * s + 0.02 * cache)


def test_dpmpp_fast_disabled_matches_exact():
    """cache_interval=1 + tail=0 must reproduce dpmpp_sample bit-for-bit
    (same ops, same order — only the loop driver differs)."""
    rng = np.random.default_rng(0)
    x_T = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    for steps in (8, 20):   # crosses the lower_order_final gate at 15
        exact = dpm.dpmpp_sample(lambda x, t: _fake_full(x, t)[0], x_T,
                                 num_steps=steps, guidance_scale=(4.0, 1.0))
        fast = dpm.dpmpp_sample_fast(_fake_full, _fake_shallow, x_T,
                                     num_steps=steps,
                                     guidance_scale=(4.0, 1.0),
                                     cache_interval=1, cfg_tail_frac=0.0)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   rtol=1e-6, atol=1e-6)


def _oracle_dpm_fast(x_T, steps, guidance, interval, tail_frac):
    """Python-loop replica of dpmpp_sample_fast: 2M update + the fastloop
    full/shallow/CFG-tail step structure."""
    from adaprompt_tpu.sampling.schedule import SD15_SCHEDULE, make_ddim_params
    _B = 2
    ts, alphas, aprev, _ = make_ddim_params(SD15_SCHEDULE, steps)
    order = np.arange(steps)[::-1]
    ts, alphas, aprev = ts[order], alphas[order], aprev[order]
    a_s = np.sqrt(alphas).astype(np.float32)
    s_s = np.sqrt(1.0 - alphas).astype(np.float32)
    a_t = np.sqrt(aprev).astype(np.float32)
    s_t = np.sqrt(1.0 - aprev).astype(np.float32)
    h = (np.log(a_t / s_t) - np.log(a_s / s_s)).astype(np.float32)
    g = ddim.guidance_schedule(steps, guidance).copy()
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
    x0_prev, h_prev = np.zeros_like(x), np.float32(1.0)

    def seg(state, idxs, use_cfg):
        x, x0_prev, h_prev = state
        n = len(idxs)
        if n == 0:
            return state
        cache = None
        for j, i in enumerate(idxs):
            # round-5 fastloop semantics: the interval applies UNIFORMLY
            # (every interval-th step full, remainder included)
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
            x0 = (x - s_s[i] * e_t) / a_s[i]
            lower = i == 0 or (steps < 15 and i == steps - 1)
            if lower:
                x0_hat = x0
            else:
                r = h_prev / h[i]
                x0_hat = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
            x = (s_t[i] / s_s[i]) * x - a_t[i] * (np.exp(-h[i]) - 1.0) * x0_hat
            x0_prev, h_prev = x0, h[i]
        return x, x0_prev, h_prev

    state = seg((x, x0_prev, h_prev), list(range(n_cfg)), True)
    state = seg(state, list(range(n_cfg, steps)), False)
    return state[0]


@pytest.mark.parametrize("steps,interval,tail", [
    (20, 3, 0.3),   # serving shape: both segments, remainders, 2M active
    (10, 3, 0.3),   # small-step: lower_order_final active on last step
    (7, 4, 0.5),    # g_cnt==0 path in the tail segment
    (6, 2, 0.0),    # no tail segment
])
def test_dpmpp_fast_matches_python_oracle(steps, interval, tail):
    rng = np.random.default_rng(steps * 100 + interval)
    x_T = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    got = dpm.dpmpp_sample_fast(_fake_full, _fake_shallow, jnp.asarray(x_T),
                                num_steps=steps, guidance_scale=(4.0, 1.0),
                                cache_interval=interval, cfg_tail_frac=tail)
    want = _oracle_dpm_fast(x_T, steps, (4.0, 1.0), interval, tail)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_pipeline_fast_dpmpp_e2e():
    """The composed serving stack end-to-end on the tiny pipeline:
    dpmpp + DeepCache + CFG-tail in one jitted graph."""
    from tests.test_pipeline import tiny_pipeline
    from adaprompt_tpu.pipeline import FastConfig
    pipe = tiny_pipeline()
    fast = FastConfig(tome_ratio=0.0, cache_interval=2, cache_depth=2,
                      cfg_tail_frac=0.3)
    imgs = pipe.generate(["a photo of a cat"], num_steps=6, height=64,
                         width=64, seed=1, fast=fast, sampler="dpmpp")
    assert imgs.shape == (1, 64, 64, 3) and imgs.dtype == np.uint8
    assert imgs.std() > 0
    # disabled fast config under dpmpp == exact dpmpp
    noop = FastConfig(tome_ratio=0.0, cache_interval=1, cache_depth=1,
                      cfg_tail_frac=0.0)
    a = pipe.generate(["a cat"], num_steps=4, height=64, width=64, seed=2,
                      sampler="dpmpp")
    b = pipe.generate(["a cat"], num_steps=4, height=64, width=64, seed=2,
                      sampler="dpmpp", fast=noop)
    np.testing.assert_allclose(a.astype(np.int32), b.astype(np.int32), atol=1)
