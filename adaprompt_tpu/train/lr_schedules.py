"""LR schedules.

  * prodigy_lr_schedule: ConstantLR(factor=1) warmup followed by
    `scheduler_cycles` PolynomialLR(power=1, total_iters=cycle*1.1) linear
    decays — the Prodigy path of the reference
    (ddpm.py:5215-5272 + ldm/util.py SequentialLR2). Each cycle decays the
    multiplier linearly from 1 to ~0.09 (= 1 - cycle/(1.1*cycle)).
  * lambda_warmup_cosine_schedule(+linear variant): the AdamW path
    (/root/reference/ldm/lr_scheduler.py LambdaWarmUpCosineScheduler /
    LambdaLinearScheduler).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def prodigy_lr_schedule(max_steps: int, warm_up_steps: int = 500,
                        scheduler_cycles: int = 1):
    total_cycle_steps = max_steps - warm_up_steps
    single = total_cycle_steps / scheduler_cycles
    last = total_cycle_steps - single * (scheduler_cycles - 1)
    boundaries = [warm_up_steps]
    for c in range(scheduler_cycles - 1):
        boundaries.append(boundaries[-1] + single)
    boundaries = np.asarray(boundaries, np.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(1.0, jnp.float32)
        # before warmup end: 1.0
        for ci in range(scheduler_cycles):
            start = boundaries[ci]
            cycle_steps = last if ci == scheduler_cycles - 1 else single
            rel = step - start
            # PolynomialLR(power=1, total_iters=1.1*cycle): mult = 1 - rel/(1.1*cycle)
            mult = jnp.clip(1.0 - rel / (1.1 * cycle_steps), 0.0, 1.0)
            in_cycle = (step >= start) & (
                (step < start + cycle_steps) if ci < scheduler_cycles - 1 else (step >= start))
            lr = jnp.where(in_cycle, mult, lr)
        return lr

    return schedule


def lambda_warmup_cosine_schedule(warm_up_steps: int, lr_start: float,
                                  lr_max: float, lr_min: float,
                                  max_decay_steps: int):
    """LambdaWarmUpCosineScheduler.schedule (ldm/lr_scheduler.py:8-33):
    linear warmup lr_start->lr_max then cosine decay lr_max->lr_min."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) / max(warm_up_steps, 1) * step
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * np.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def lambda_linear_schedule(warm_up_steps: int, lr_start: float, lr_max: float,
                           lr_min: float, max_decay_steps: int):
    """LambdaLinearScheduler variant: linear warmup then linear decay."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) / max(warm_up_steps, 1) * step
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        lin = lr_max + t * (lr_min - lr_max)
        return jnp.where(step < warm_up_steps, warm, lin)

    return schedule
