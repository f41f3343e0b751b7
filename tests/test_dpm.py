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
    # unknown sampler / fast+dpmpp must be rejected
    with pytest.raises(ValueError):
        pipe.generate(["x"], num_steps=2, sampler="plms",
                      height=64, width=64)
    from adaprompt_tpu.pipeline import FastConfig
    with pytest.raises(ValueError):
        pipe.generate(["x"], num_steps=2, sampler="dpmpp",
                      fast=FastConfig(cache_interval=2), height=64, width=64)
