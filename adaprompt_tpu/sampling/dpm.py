"""DPM-Solver++(2M) sampler as one `lax.scan` — a second-order multistep
ODE solver over the same probability-flow ODE the DDIM sampler integrates
(DPM-Solver++: Lu et al., arXiv:2211.01095, data-prediction multistep
variant), so ~20-25 steps match DDIM-50 quality on SD-scale models.

No counterpart exists in the reference (its research and product paths are
DDIM-50, ddim.py / adaface_wrapper.py:104-141); this is a TPU-serving
throughput capability: the UNet evaluation count per image drops 2-2.5x
with the same weights and the same exact-CFG semantics. Opt-in via
`AdaPromptPipeline.generate(sampler="dpmpp")` / `cli.txt2img --sampler`.

Shared conventions with sampling/ddim.py:
  * the reference's uniform DDIM discretization + final boundary
    alpha_bar[0] (make_ddim_params) — NOT a new timestep grid, so the
    samplers are directly comparable and the final noise floor matches,
  * classifier-free guidance with the (cond, uncond) batch order and the
    linearly annealed scale (guidance_schedule),
  * whole loop inside one `lax.scan`, fp32 state.

Math (eps model -> data prediction): with alpha = sqrt(alpha_bar),
sigma = sqrt(1-alpha_bar), lambda = log(alpha/sigma), the exact solution
of the PF-ODE from s to t is
    x_t = (sigma_t/sigma_s) x_s - alpha_t (e^{-h} - 1) X0 + O(h^{k+1}),
h = lambda_t - lambda_s, where X0 is a k-th order polynomial extrapolation
of the data prediction x0(lambda). 2M uses the previous step's x0:
    r = h_{prev}/h,  X0 = (1 + 1/(2r)) x0_i - 1/(2r) x0_{i-1}.
The first step (no history) runs first order, which is ALGEBRAICALLY
IDENTICAL to a deterministic DDIM step — tested invariant. The final step
also drops to first order when num_steps < 15 (lower_order_final, the
standard small-step-count stabilization — same gate as diffusers'
DPMSolverMultistepScheduler); at serving step counts (>= 15) the last
step stays second order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.sampling.ddim import EpsModel, guidance_schedule
from adaprompt_tpu.sampling.schedule import (
    DiffusionSchedule, SD15_SCHEDULE, make_ddim_params,
)


def dpmpp_sample(model_fn: EpsModel, x_T: jax.Array, *,
                 num_steps: int = 20,
                 guidance_scale=(4.0, 1.0),
                 sched: DiffusionSchedule = SD15_SCHEDULE,
                 use_cfg: bool = True,
                 solver_order: int = 2,
                 timesteps: np.ndarray | None = None) -> jax.Array:
    """Run the DPM-Solver++(2M) loop. Same contract as ddim.ddim_sample
    (deterministic; no inpainting mask — use the DDIM path for that).

    solver_order: 2 = 2M (default); 1 = pure first order, which equals
    deterministic DDIM step-for-step (used by the parity test).
    timesteps: optional explicit ascending ddpm-timestep grid (see
    schedule.make_ddim_params).
    """
    if solver_order not in (1, 2):
        raise ValueError(f"solver_order must be 1 or 2, got {solver_order}")
    b = x_T.shape[0]
    ts, alphas, alphas_prev, _ = make_ddim_params(sched, num_steps,
                                                  timesteps=timesteps)
    num_steps = len(ts)
    order = np.arange(num_steps)[::-1]
    ts, alphas, alphas_prev = ts[order], alphas[order], alphas_prev[order]

    a_s = np.sqrt(alphas)                    # source (current) level per step
    s_s = np.sqrt(1.0 - alphas)
    a_t = np.sqrt(alphas_prev)               # target level per step
    s_t = np.sqrt(1.0 - alphas_prev)
    lam_s = np.log(a_s / s_s)
    lam_t = np.log(a_t / s_t)
    h = (lam_t - lam_s).astype(np.float32)   # > 0 (denoising direction)

    g_t = jnp.asarray(guidance_schedule(num_steps, guidance_scale))
    per_step = (jnp.asarray(ts), jnp.asarray(a_s, jnp.float32),
                jnp.asarray(s_s, jnp.float32), jnp.asarray(a_t, jnp.float32),
                jnp.asarray(s_t, jnp.float32), jnp.asarray(h), g_t,
                jnp.arange(num_steps))

    def eps_fn(x, t, g):
        tb = jnp.full((b,), t, dtype=jnp.int32)
        if use_cfg:
            e_all = model_fn(jnp.concatenate([x, x], 0),
                             jnp.concatenate([tb, tb], 0))
            e_c, e_u = jnp.split(e_all, 2, axis=0)
            return e_u + g.astype(x.dtype) * (e_c - e_u)
        return model_fn(x, tb)

    def step(carry, ps):
        x, x0_prev, h_prev = carry
        t, as_, ss_, at_, st_, hi, g, i = ps
        e_t = eps_fn(x, t, g)
        x0 = (x - ss_ * e_t) / as_

        if solver_order == 2:
            r = h_prev / hi
            x0_2m = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
            # first step has no history; final step runs first order
            # (lower_order_final) only at small step counts — see module doc
            lower = i == 0
            if num_steps < 15:
                lower = jnp.logical_or(lower, i == num_steps - 1)
            x0_hat = jnp.where(lower, x0, x0_2m)
        else:
            x0_hat = x0
        x_next = (st_ / ss_) * x - at_ * (jnp.exp(-hi) - 1.0) * x0_hat
        return (x_next, x0, hi), None

    init = (x_T, jnp.zeros_like(x_T), jnp.float32(1.0))
    (x, _, _), _ = jax.lax.scan(step, init, per_step)
    return x


def dpmpp_sample_fast(model_full, model_shallow, x_T: jax.Array, *,
                      num_steps: int = 20,
                      guidance_scale=(4.0, 1.0),
                      sched: DiffusionSchedule = SD15_SCHEDULE,
                      cache_interval: int = 1,
                      cfg_tail_frac: float = 0.0) -> jax.Array:
    """DPM-Solver++(2M) under the serving fast paths — the composed TPU
    serving stack: the 2.5x step-count reduction of the 2M solver TIMES the
    DeepCache / CFG-tail / (UNet-level ToMe) accelerations of
    sampling/fastloop.py. With cache_interval=1 and cfg_tail_frac=0 this is
    exactly `dpmpp_sample` (tested invariant).

    Same model contract as ddim.ddim_sample_fast: model_full returns
    (eps, deep_cache) and accepts both the doubled CFG batch and the plain
    batch; model_shallow resumes from the cache. Approximate — opt-in only
    (pipeline.FastConfig + sampler="dpmpp").

    Note on the 2M history: the x0 extrapolation uses whatever the previous
    step's eps was — a shallow-pass eps on cached steps, a cond-only eps in
    the CFG tail. Both carry straight through the solver state; the drift
    they add is measured per preset in docs/PERF.md.
    """
    from adaprompt_tpu.sampling.fastloop import fast_cached_loop

    ts, alphas, alphas_prev, _ = make_ddim_params(sched, num_steps)
    num_steps = len(ts)
    order = np.arange(num_steps)[::-1]
    ts, alphas, alphas_prev = ts[order], alphas[order], alphas_prev[order]

    a_s = np.sqrt(alphas)
    s_s = np.sqrt(1.0 - alphas)
    a_t = np.sqrt(alphas_prev)
    s_t = np.sqrt(1.0 - alphas_prev)
    lam_s = np.log(a_s / s_s)
    lam_t = np.log(a_t / s_t)
    h = (lam_t - lam_s).astype(np.float32)

    g_all = guidance_schedule(num_steps, guidance_scale)
    n_cfg = int(round(num_steps * (1.0 - cfg_tail_frac)))
    n_cfg = max(min(n_cfg, num_steps), 0)
    if cfg_tail_frac > 0:
        g_all = g_all.copy()
        g_all[n_cfg:] = 1.0

    # first-order (DDIM-equal) steps: step 0 (no history) and, at small
    # step counts, the final step (lower_order_final — see dpmpp_sample)
    lower = np.zeros(num_steps, bool)
    lower[0] = True
    if num_steps < 15:
        lower[-1] = True

    arrs = (jnp.asarray(ts), jnp.asarray(g_all),
            jnp.asarray(a_s, jnp.float32), jnp.asarray(s_s, jnp.float32),
            jnp.asarray(a_t, jnp.float32), jnp.asarray(s_t, jnp.float32),
            jnp.asarray(h), jnp.asarray(lower))

    def update(carry, e_t, ps):
        x, x0_prev, h_prev = carry
        _, _, as_, ss_, at_, st_, hi, low = ps
        x0 = (x - ss_ * e_t) / as_
        r = h_prev / hi
        x0_2m = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        x0_hat = jnp.where(low, x0, x0_2m)
        x_next = (st_ / ss_) * x - at_ * (jnp.exp(-hi) - 1.0) * x0_hat
        return (x_next, x0, hi)

    init = (x_T, jnp.zeros_like(x_T), jnp.float32(1.0))
    (x, _, _) = fast_cached_loop(model_full, model_shallow, init, arrs,
                                 update, cache_interval=cache_interval,
                                 n_cfg=n_cfg)
    return x
