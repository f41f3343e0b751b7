"""DDIM sampler as one `lax.scan` — the whole denoise loop is a single
compiled XLA graph.

Semantics mirror the reference DDIMSampler
(/root/reference/ldm/models/diffusion/ddim.py):
  * uniform timesteps [981, 961, ..., 1] for 50 steps (ddim.py:28-39),
  * eta=0 (deterministic; sigmas all zero, ddim.py:57-63),
  * classifier-free guidance with the *(cond, uncond)* batch order
    (ddim.py:234-247 — keeps subject-token indices valid),
  * linearly annealed guidance scale max->min over steps
    (ddim.py:168-180, 215-218): min defaults to min(2, max), one delta of
    (max-min)/(S-1) per step,
  * x_prev = sqrt(a_prev) * pred_x0 + sqrt(1-a_prev) * e_t (ddim.py:273-296),
  * optional inpainting-style mask/x0 blending per step (ddim.py:190-195)
    and stochastic_encode/decode for img2img (ddim.py:298-350).

TPU-first: the scan keeps everything on device; the model function is called
once per step on the doubled (cond|uncond) batch so XLA sees one fused step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.sampling.schedule import (
    DiffusionSchedule, SD15_SCHEDULE, make_ddim_params, q_sample,
)

# eps-model signature: (x [2B,H,W,C], t [2B]) -> eps [2B,H,W,C]
# (context is already closed over, cond in the first half, uncond second)
EpsModel = Callable[[jax.Array, jax.Array], jax.Array]


def guidance_schedule(num_steps: int, guidance_scale) -> np.ndarray:
    """Per-step annealed CFG scales (ddim.py:168-180, 215-218)."""
    if isinstance(guidance_scale, (tuple, list)):
        gmax, gmin = float(guidance_scale[0]), float(guidance_scale[1])
    else:
        gmax = float(guidance_scale)
        gmin = min(2.0, gmax)
    delta = (gmax - gmin) / max(num_steps - 1, 1)
    return (gmax - delta * np.arange(num_steps)).astype(np.float32)


def ddim_sample(model_fn: EpsModel, x_T: jax.Array, *,
                num_steps: int = 50,
                guidance_scale=(4.0, 1.0),
                sched: DiffusionSchedule = SD15_SCHEDULE,
                eta: float = 0.0,
                mask: jax.Array | None = None,
                x0: jax.Array | None = None,
                noise_key: jax.Array | None = None,
                use_cfg: bool = True,
                timesteps: np.ndarray | None = None) -> jax.Array:
    """Run the full DDIM loop.

    Args:
      model_fn: eps model over the doubled batch (see EpsModel). When
        use_cfg=False it is called on the plain batch.
      x_T: [B, H, W, C] initial noise.
      mask/x0: optional inpainting blend — at each step the known region
        (mask==1) is re-noised from x0 and pasted in (ddim.py:190-195).
      noise_key: PRNG key, needed when eta > 0 or mask is given.

    Returns x_0 latents [B, H, W, C].
    """
    b = x_T.shape[0]
    ts, alphas, alphas_prev, sigmas = make_ddim_params(sched, num_steps, eta,
                                                       timesteps=timesteps)
    num_steps = len(ts)
    # reversed order: step i uses index (num_steps-1-i)
    order = np.arange(num_steps)[::-1]
    steps_t = jnp.asarray(ts[order])                 # [S] ddpm timesteps 981..1
    a_t = jnp.asarray(alphas[order])
    a_prev = jnp.asarray(alphas_prev[order])
    sig_t = jnp.asarray(sigmas[order])
    g_t = jnp.asarray(guidance_schedule(num_steps, guidance_scale))

    if noise_key is None:
        noise_key = jax.random.PRNGKey(0)
    step_keys = jax.random.split(noise_key, num_steps)

    def step(x, per_step):
        t, at, aprev, sigma, g, key = per_step
        tb = jnp.full((b,), t, dtype=jnp.int32)

        if mask is not None:
            img_orig = q_sample(sched, x0, tb, jax.random.normal(key, x.shape, x.dtype))
            x = img_orig * mask + (1.0 - mask) * x

        if use_cfg:
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([tb, tb], axis=0)
            e_all = model_fn(x_in, t_in)
            e_c, e_u = jnp.split(e_all, 2, axis=0)
            e_t = e_u + g.astype(x.dtype) * (e_c - e_u)
        else:
            e_t = model_fn(x, tb)

        pred_x0 = (x - jnp.sqrt(1.0 - at) * e_t) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(1.0 - aprev - sigma ** 2) * e_t
        noise = sigma * jax.random.normal(key, x.shape, x.dtype)
        x_prev = jnp.sqrt(aprev) * pred_x0 + dir_xt + noise
        return x_prev, None

    x, _ = jax.lax.scan(step, x_T, (steps_t, a_t, a_prev, sig_t, g_t, step_keys))
    return x


def ddim_sample_fast(model_full, model_shallow, x_T: jax.Array, *,
                     num_steps: int = 50,
                     guidance_scale=(4.0, 1.0),
                     sched: DiffusionSchedule = SD15_SCHEDULE,
                     cache_interval: int = 1,
                     cfg_tail_frac: float = 0.0) -> jax.Array:
    """DDIM loop with the serving fast paths (docs/PERF.md):

      * DeepCache deep-feature reuse (arXiv:2312.00858): one FULL UNet pass
        every `cache_interval` steps; in-between steps run only the shallow
        blocks against the cached deep feature (unet.forward cache_depth).
      * CFG tail truncation (guidance-interval, arXiv:2404.07724 family):
        the final `cfg_tail_frac` of steps run condition-only — their
        guidance scale is pinned to exactly 1, which makes dropping the
        uncond half EXACT for that (modified) guidance schedule.

    Both are approximations of the reference's exact sampler and default
    OFF everywhere; quality must be validated per checkpoint.

    Args:
      model_full: (x_in, t_in) -> (eps, deep_cache); must accept both the
        doubled CFG batch and the plain batch (cond context first).
      model_shallow: (x_in, t_in, deep_cache) -> eps.
      cache_interval: 1 = full pass every step (no caching).
      cfg_tail_frac: fraction of trailing steps without CFG.

    Returns x_0 latents [B, H, W, C] (eta=0; no inpainting mask support on
    the fast path — use ddim_sample for those).
    """
    from adaprompt_tpu.sampling.fastloop import fast_cached_loop

    ts, alphas, alphas_prev, _ = make_ddim_params(sched, num_steps)
    order = np.arange(num_steps)[::-1]
    g_all = guidance_schedule(num_steps, guidance_scale)

    n_cfg = int(round(num_steps * (1.0 - cfg_tail_frac)))
    n_cfg = max(min(n_cfg, num_steps), 0)
    if cfg_tail_frac > 0:
        # pin the tail to exactly 1 so cond-only is exact for this schedule
        g_all = g_all.copy()
        g_all[n_cfg:] = 1.0

    arrs = (jnp.asarray(ts[order]), jnp.asarray(g_all),
            jnp.asarray(alphas[order]), jnp.asarray(alphas_prev[order]))

    def update(carry, e_t, ps):
        (x,) = carry
        _, _, at, aprev = ps
        pred_x0 = (x - jnp.sqrt(1.0 - at) * e_t) / jnp.sqrt(at)
        return (jnp.sqrt(aprev) * pred_x0 + jnp.sqrt(1.0 - aprev) * e_t,)

    (x,) = fast_cached_loop(model_full, model_shallow, (x_T,), arrs, update,
                            cache_interval=cache_interval, n_cfg=n_cfg)
    return x


def stochastic_encode(x0: jax.Array, ddim_step_index: jax.Array, key: jax.Array,
                      *, num_steps: int, sched: DiffusionSchedule = SD15_SCHEDULE,
                      noise: jax.Array | None = None) -> jax.Array:
    """Noise x0 up to DDIM step `ddim_step_index` (img2img entry,
    ddim.py:298-312)."""
    _, alphas, _, _ = make_ddim_params(sched, num_steps)
    if noise is None:
        noise = jax.random.normal(key, x0.shape, x0.dtype)
    a = jnp.asarray(alphas)[ddim_step_index]
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def ddim_decode(model_fn: EpsModel, x_latent: jax.Array, t_start: int, *,
                num_steps: int, guidance_scale=1.0,
                sched: DiffusionSchedule = SD15_SCHEDULE,
                use_cfg: bool = True) -> jax.Array:
    """img2img decode: run the last `t_start` DDIM steps (ddim.py:314-350)."""
    b = x_latent.shape[0]
    ts, alphas, alphas_prev, _ = make_ddim_params(sched, num_steps)
    ts, alphas, alphas_prev = ts[:t_start], alphas[:t_start], alphas_prev[:t_start]
    order = np.arange(t_start)[::-1]
    steps_t = jnp.asarray(ts[order])
    a_t = jnp.asarray(alphas[order])
    a_prev = jnp.asarray(alphas_prev[order])
    g_t = jnp.asarray(guidance_schedule(t_start, guidance_scale))

    def step(x, per_step):
        t, at, aprev, g = per_step
        tb = jnp.full((b,), t, dtype=jnp.int32)
        if use_cfg:
            e_all = model_fn(jnp.concatenate([x, x], 0), jnp.concatenate([tb, tb], 0))
            e_c, e_u = jnp.split(e_all, 2, axis=0)
            e_t = e_u + g.astype(x.dtype) * (e_c - e_u)
        else:
            e_t = model_fn(x, tb)
        pred_x0 = (x - jnp.sqrt(1.0 - at) * e_t) / jnp.sqrt(at)
        x_prev = jnp.sqrt(aprev) * pred_x0 + jnp.sqrt(1.0 - aprev) * e_t
        return x_prev, None

    x, _ = jax.lax.scan(step, x_latent, (steps_t, a_t, a_prev, g_t))
    return x
