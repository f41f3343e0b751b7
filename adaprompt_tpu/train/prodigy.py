"""Prodigy (D-adaptation Adam) as an optax gradient transformation.

Port of the reference optimizer math (/root/reference/ldm/prodigy.py:97-252):
  * one global D estimate adapted from  d_hat = d_coef * d_numerator/d_denom,
    d_numerator = EMA_beta3 of (d/d0)*dlr*<g, p0-p>,
    d_denom     = sum_p |s_p|,  s_p = EMA_beta3 of (d/d0)*dlr*g
    (or (d/d0)*d*g under safeguard_warmup);
  * Adam EMAs scaled by d: m <- b1 m + d(1-b1) g;  v <- b2 v + d^2 (1-b2) g^2;
  * step: p <- p - dlr * m / (sqrt(v) + d_new*eps) with dlr = d*lr*bias_corr
    computed from the *pre-update* d and the denominator using the *post-
    update* d (matching the reference's two-loop structure);
  * decoupled weight decay p <- p - decay*dlr*p.

The reference's FSDP all-reduce of (d_numerator, d_denom) is unnecessary
here: under pjit the loss/grads are already global, so the dots and sums
are computed on replicated values.

lr may be a float or an optax schedule (step -> multiplier); the reference
drives it with warmup-constant + linear-decay cycles
(lr_schedules.prodigy_lr_schedule).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Union, Callable

import chex
import jax
import jax.numpy as jnp
import optax


def additive(*txs: optax.GradientTransformation) -> optax.GradientTransformation:
    """Sum the updates of several transformations applied to the same grads —
    the reference's ProdigyAdamW dual-optimizer scheme (ddpm.py:5274-5302)
    steps Prodigy and a warm-started AdamW on the same parameters."""

    def init(params):
        return tuple(tx.init(params) for tx in txs)

    def update(grads, state, params=None):
        new_states = []
        total = None
        for tx, st in zip(txs, state):
            upd, st2 = tx.update(grads, st, params)
            new_states.append(st2)
            total = upd if total is None else jax.tree.map(jnp.add, total, upd)
        return total, tuple(new_states)

    return optax.GradientTransformation(init, update)


def prodigy_adamw(max_steps: int, base_lr: float, *, warm_up_steps: int = 500,
                  d_coef: float = 2.0, prodigy_betas=(0.9, 0.999),
                  adam_betas=(0.9, 0.993), weight_decay: float = 0.0):
    """ProdigyAdamW: Prodigy (with its warmup+linear-decay schedule) plus an
    AdamW that idles at lr*1e-4 for the first half and ramps with a one-cycle
    schedule over the last cycle (ddpm.py:5274-5302 semantics)."""
    import numpy as np
    from adaprompt_tpu.train.lr_schedules import prodigy_lr_schedule

    p_sched = prodigy_lr_schedule(max_steps, warm_up_steps, 1)
    last_cycle = max_steps - warm_up_steps
    kickin = max_steps - last_cycle

    def adamw_sched(step):
        step = jnp.asarray(step, jnp.float32)
        idle = base_lr * 1e-4
        # one-cycle: ramp to base_lr/4 at 30% of the cycle, back to base_lr/40
        rel = jnp.clip((step - kickin) / max(last_cycle, 1), 0.0, 1.0)
        up = rel / 0.3
        down = (rel - 0.3) / 0.7
        max_lr, init_lr = base_lr / 4, base_lr / 40
        lr_cycle = jnp.where(rel < 0.3,
                             init_lr + (max_lr - init_lr) * 0.5 * (1 - jnp.cos(np.pi * up)),
                             init_lr + (max_lr - init_lr) * 0.5 * (1 + jnp.cos(np.pi * down)))
        return jnp.where(step < kickin, idle, lr_cycle)

    return additive(
        prodigy(lr=p_sched, betas=prodigy_betas, d_coef=d_coef,
                use_bias_correction=True, weight_decay=weight_decay),
        optax.adamw(adamw_sched, b1=adam_betas[0], b2=adam_betas[1],
                    weight_decay=weight_decay),
    )


class ProdigyState(NamedTuple):
    exp_avg: chex.ArrayTree
    exp_avg_sq: chex.ArrayTree
    s: chex.ArrayTree
    p0: chex.ArrayTree
    d: jax.Array
    d_max: jax.Array
    d_numerator: jax.Array
    count: jax.Array


def prodigy(lr: Union[float, Callable] = 1.0, betas=(0.9, 0.999),
            beta3: float | None = None, eps: float = 1e-8,
            weight_decay: float = 0.0, use_bias_correction: bool = False,
            safeguard_warmup: bool = False, d0: float = 1e-6,
            d_coef: float = 1.0,
            growth_rate: float = float("inf")) -> optax.GradientTransformation:
    beta1, beta2 = betas
    if beta3 is None:
        beta3 = math.sqrt(beta2)

    def lr_at(count):
        return lr(count) if callable(lr) else jnp.asarray(lr, jnp.float32)

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return ProdigyState(
            exp_avg=zeros(), exp_avg_sq=zeros(), s=zeros(),
            p0=jax.tree.map(jnp.copy, params),
            d=jnp.asarray(d0, jnp.float32), d_max=jnp.asarray(d0, jnp.float32),
            d_numerator=jnp.asarray(0.0, jnp.float32),
            count=jnp.zeros((), jnp.int32))

    def update(grads, state: ProdigyState, params=None):
        assert params is not None, "prodigy requires params"
        k = state.count
        d = state.d
        cur_lr = lr_at(k)
        if use_bias_correction:
            bc = jnp.sqrt(1.0 - beta2 ** (k + 1).astype(jnp.float32)) / \
                 (1.0 - beta1 ** (k + 1).astype(jnp.float32))
        else:
            bc = 1.0
        dlr = d * cur_lr * bc

        # d_numerator: EMA + sum over params of (d/d0)*dlr*<g, p0-p>
        dots = jax.tree.map(
            lambda g, p, p0: jnp.vdot(g.astype(jnp.float32), (p0 - p).astype(jnp.float32)),
            grads, params, state.p0)
        dot_sum = jax.tree.reduce(jnp.add, dots, jnp.asarray(0.0, jnp.float32))
        d_numerator = state.d_numerator * beta3 + (d / d0) * dlr * dot_sum

        exp_avg = jax.tree.map(lambda m, g: m * beta1 + g * (d * (1 - beta1)),
                               state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(lambda v, g: v * beta2 + g * g * (d * d * (1 - beta2)),
                                  state.exp_avg_sq, grads)
        s_coef = (d / d0) * (d if safeguard_warmup else dlr)
        s = jax.tree.map(lambda s_, g: s_ * beta3 + g * s_coef, state.s, grads)
        d_denom = jax.tree.reduce(
            jnp.add, jax.tree.map(lambda s_: jnp.sum(jnp.abs(s_.astype(jnp.float32))), s),
            jnp.asarray(0.0, jnp.float32))

        d_hat = d_coef * d_numerator / jnp.where(d_denom > 0, d_denom, 1.0)
        # if d still equals d0 (no progress yet): jump straight to d_hat if bigger
        d_new = jnp.where(d == d0, jnp.maximum(d, d_hat), d)
        d_max = jnp.maximum(state.d_max, d_hat)
        gr = jnp.asarray(min(growth_rate, 1e30), jnp.float32)
        d_new = jnp.minimum(d_max, d_new * gr)
        # no progress this step (all grads zero) -> keep everything
        progressed = d_denom > 0
        d_new = jnp.where(progressed, d_new, d)
        d_max = jnp.where(progressed, d_max, state.d_max)
        d_numerator = jnp.where(progressed, d_numerator, state.d_numerator)

        def step_update(m, v, p):
            denom = jnp.sqrt(v.astype(jnp.float32)) + d_new * eps
            upd = -dlr * m.astype(jnp.float32) / denom
            if weight_decay > 0:
                upd = upd - weight_decay * dlr * p.astype(jnp.float32)
            return jnp.where(progressed, upd, 0.0).astype(p.dtype)

        updates = jax.tree.map(step_update, exp_avg, exp_avg_sq, params)
        new_state = ProdigyState(exp_avg=exp_avg, exp_avg_sq=exp_avg_sq, s=s,
                                 p0=state.p0, d=d_new, d_max=d_max,
                                 d_numerator=d_numerator, count=k + 1)
        return updates, new_state

    return optax.GradientTransformation(init, update)
