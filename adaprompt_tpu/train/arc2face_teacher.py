"""Arc2Face teacher: multi-step denoising chain producing distillation
targets.

JAX port of Arc2FaceWrapper.forward
(/root/reference/ldm/models/diffusion/ddpm.py:5402-5478): starting from
(x_start, noise, t), repeat `num_denoising_steps` times:
    x_noisy = q_sample(x_start, t, noise)
    noise_pred = teacher_unet(x_noisy, t, context)       # context [B,21,768]
    pred_x0 = predict_start_from_noise(x_noisy, t, noise_pred)
    next t ~ U(t*0.5^a, t*0.7^a), a = (ND-1)^-0.3; next noise ~ N(0,1)
returning (noise_preds, pred_x0s, noises, ts). Everything is stop_gradient
(teacher is frozen, reference runs under no_grad + fp16 autocast; here bf16).

num_denoising_steps is static (one compiled variant per value; the reference
randomizes it in {1,3,5,7} host-side, ddpm.py README:81).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.models import unet as unet_mod
from adaprompt_tpu.sampling.schedule import (DiffusionSchedule, SD15_SCHEDULE,
                                             q_sample, predict_start_from_noise)


def teacher_denoise_chain(teacher_params: dict, x_start: jax.Array,
                          noise: jax.Array, t: jax.Array, context: jax.Array,
                          key: jax.Array, *, num_denoising_steps: int = 1,
                          unet_cfg: unet_mod.UNetConfig = unet_mod.SD15_UNET_CONFIG,
                          sched: DiffusionSchedule = SD15_SCHEDULE,
                          compute_dtype=jnp.bfloat16):
    """Returns (noise_preds, pred_x0s, noises, ts) — lists of length ND.

    x_start/noise: [B, h, w, 4] NHWC; t: [B] int; context: [B, S, 768].
    """
    assert num_denoising_steps <= 10
    x_starts = [x_start]
    noises = [noise]
    ts = [t]
    noise_preds = []

    nd = num_denoising_steps
    for i in range(nd):
        x_i, t_i, n_i = x_starts[i], ts[i], noises[i]
        x_noisy = q_sample(sched, x_i, t_i, n_i)
        eps = unet_mod.forward(teacher_params, x_noisy.astype(compute_dtype),
                               t_i, context.astype(compute_dtype),
                               cfg=unet_cfg).astype(jnp.float32)
        noise_preds.append(eps)
        pred_x0 = predict_start_from_noise(sched, x_noisy, t_i, eps)
        x_starts.append(pred_x0)

        if i < nd - 1:
            key, k1, k2 = jax.random.split(key, 3)
            rel = jax.random.uniform(k1, t_i.shape, jnp.float32)
            a = np.power(nd - 1, -0.3)
            t_lb = t_i.astype(jnp.float32) * np.power(0.5, a)
            t_ub = t_i.astype(jnp.float32) * np.power(0.7, a)
            ts.append(((t_ub - t_lb) * rel + t_lb).astype(jnp.int32))
            noises.append(jax.random.normal(k2, pred_x0.shape, jnp.float32))

    stop = lambda xs: [jax.lax.stop_gradient(x) for x in xs]
    return stop(noise_preds), stop(x_starts[1:]), stop(noises), ts
