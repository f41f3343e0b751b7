"""Parity: optax Prodigy vs the reference ldm/prodigy.py on a shared
optimization trajectory."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
import optax

from adaprompt_tpu.train.prodigy import prodigy
from adaprompt_tpu.train import lr_schedules

import torch_oracle


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(use_bias_correction=True, d_coef=2.0),
    dict(safeguard_warmup=True, weight_decay=0.01),
])
def test_prodigy_trajectory_parity(kwargs):
    ref_mod = torch_oracle.load("ldm.prodigy")
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    b0 = rng.standard_normal((3,)).astype(np.float32)
    X = rng.standard_normal((16, 4)).astype(np.float32)
    Y = rng.standard_normal((16, 3)).astype(np.float32)

    # torch side
    wt = torch.tensor(w0, requires_grad=True)
    bt = torch.tensor(b0, requires_grad=True)
    opt = ref_mod.Prodigy([wt, bt], lr=1.0, betas=(0.9, 0.99), **kwargs)
    Xt, Yt = torch.tensor(X), torch.tensor(Y)
    torch_traj = []
    for i in range(12):
        opt.zero_grad()
        loss = ((Xt @ wt + bt - Yt) ** 2).mean()
        loss.backward()
        opt.step()
        torch_traj.append((wt.detach().numpy().copy(), bt.detach().numpy().copy()))

    # jax side
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    tx = prodigy(lr=1.0, betas=(0.9, 0.99), **kwargs)
    state = tx.init(params)

    def loss_fn(p):
        return jnp.mean((jnp.asarray(X) @ p["w"] + p["b"] - jnp.asarray(Y)) ** 2)

    for i in range(12):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]), torch_traj[i][0],
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(params["b"]), torch_traj[i][1],
                                   atol=1e-5, rtol=1e-4)


def test_prodigy_zero_grads_no_movement():
    params = {"w": jnp.ones((3,))}
    tx = prodigy()
    state = tx.init(params)
    updates, state2 = tx.update({"w": jnp.zeros((3,))}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)
    np.testing.assert_allclose(float(state2.d), float(state.d))


def test_prodigy_lr_schedule_shape():
    sched = lr_schedules.prodigy_lr_schedule(2000, warm_up_steps=500,
                                             scheduler_cycles=1)
    assert float(sched(0)) == 1.0
    assert float(sched(499)) == 1.0
    # end of training: decayed to ~1 - 1500/1650 = 0.0909
    np.testing.assert_allclose(float(sched(1999)), 1.0 - 1499 / 1650, atol=1e-3)


def test_warmup_cosine_schedule():
    s = lr_schedules.lambda_warmup_cosine_schedule(100, 0.01, 1.0, 0.1, 1000)
    assert abs(float(s(0)) - 0.01) < 1e-6
    assert abs(float(s(100)) - 1.0) < 1e-2
    np.testing.assert_allclose(float(s(1000)), 0.1, atol=1e-6)


def test_multisteps_accum_matches_manual_accum():
    """optax.MultiSteps(clip+Prodigy, k) must reproduce the reference's
    manual gradient accumulation (ddpm.py:606-633): k micro-batch grads are
    MEANED, clipped once, and fed to Prodigy as ONE pseudo-step — so
    Prodigy's D adaptation sees the same gradient stream in both schemes."""
    rng = np.random.default_rng(1)
    k = 2
    params = {"w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)}
    micro_grads = [
        {"w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)}
        for _ in range(3 * k)]

    inner = lambda: optax.chain(optax.clip_by_global_norm(0.5),
                                prodigy(lr=1.0, betas=(0.9, 0.99)))

    # ours: MultiSteps over every micro grad
    tx = optax.MultiSteps(inner(), every_k_schedule=k)
    st = tx.init(params)
    p_ms = params
    for g in micro_grads:
        upd, st = tx.update(g, st, p_ms)
        p_ms = optax.apply_updates(p_ms, upd)

    # reference scheme: mean the k grads host-side, single optimizer step
    tx2 = inner()
    st2 = tx2.init(params)
    p_ref = params
    for i in range(0, len(micro_grads), k):
        mean_g = jax.tree.map(
            lambda *gs: sum(gs) / k, *micro_grads[i:i + k])
        upd, st2 = tx2.update(mean_g, st2, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)

    np.testing.assert_allclose(np.asarray(p_ms["w"]), np.asarray(p_ref["w"]),
                               rtol=1e-6, atol=1e-6)
