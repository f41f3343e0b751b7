"""Diffusion noise schedules and forward-process math.

Mirrors the reference DDPM schedule registration
(/root/reference/ldm/models/diffusion/ddpm.py:240-292 register_schedule;
 ldm/modules/diffusionmodules/util.py make_beta_schedule/make_ddim_timesteps/
 make_ddim_sampling_parameters) as plain arrays + pure functions.

SD-1.5: linear ("scaled linear") beta schedule, linear_start=0.00085,
linear_end=0.012, T=1000 (v1-finetune-ada.yaml:8-13).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(num_timesteps: int = 1000, linear_start: float = 0.00085,
               linear_end: float = 0.012) -> np.ndarray:
    """'linear' schedule in LDM terms: linspace in sqrt-beta space, squared."""
    return np.linspace(linear_start ** 0.5, linear_end ** 0.5, num_timesteps,
                       dtype=np.float64) ** 2


@dataclasses.dataclass(frozen=True, eq=False)  # eq=False: identity hash, usable as a static jit arg
class DiffusionSchedule:
    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    @classmethod
    def create(cls, num_timesteps: int = 1000, linear_start: float = 0.00085,
               linear_end: float = 0.012) -> "DiffusionSchedule":
        betas = make_betas(num_timesteps, linear_start, linear_end)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        return cls(
            betas=betas.astype(np.float32),
            alphas_cumprod=acp.astype(np.float32),
            alphas_cumprod_prev=acp_prev.astype(np.float32),
            sqrt_alphas_cumprod=np.sqrt(acp).astype(np.float32),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - acp).astype(np.float32),
            sqrt_recip_alphas_cumprod=np.sqrt(1.0 / acp).astype(np.float32),
            sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / acp - 1.0).astype(np.float32),
        )


SD15_SCHEDULE = DiffusionSchedule.create()


def _gather(arr, t, ndim):
    """arr[t] broadcast to an image batch: t [B] -> [B, 1, 1, 1]."""
    g = jnp.asarray(arr)[t]
    return g.reshape(g.shape + (1,) * (ndim - 1))


def q_sample(sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """Forward diffusion x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps
    (ddpm.py q_sample)."""
    return (_gather(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _gather(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise)


def predict_start_from_noise(sched: DiffusionSchedule, x_t: jax.Array,
                             t: jax.Array, noise: jax.Array) -> jax.Array:
    """x0_hat = sqrt(1/acp_t) x_t - sqrt(1/acp_t - 1) eps (ddpm.py:398-403)."""
    return (_gather(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _gather(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise)


def make_ddim_timesteps(num_ddim_steps: int, num_ddpm_timesteps: int = 1000) -> np.ndarray:
    """Uniform DDIM discretization, +1 offset: [1, 21, ..., 981] for 50 steps
    (ldm/modules/diffusionmodules/util.py make_ddim_timesteps 'uniform')."""
    c = num_ddpm_timesteps // num_ddim_steps
    return (np.arange(0, num_ddim_steps) * c + 1).astype(np.int64)


def make_ddim_params(sched: DiffusionSchedule, num_ddim_steps: int,
                     eta: float = 0.0, timesteps: np.ndarray | None = None):
    """(timesteps, alphas, alphas_prev, sigmas) for the DDIM sampler
    (util.make_ddim_sampling_parameters).

    timesteps: optional explicit ascending ddpm-timestep grid overriding
    the uniform discretization (custom spacings; also lets tests compare
    samplers over identical integration endpoints — the uniform grid's
    START point shifts with num_ddim_steps)."""
    ts = (np.asarray(timesteps, np.int64) if timesteps is not None
          else make_ddim_timesteps(num_ddim_steps, sched.num_timesteps))
    acp = sched.alphas_cumprod
    alphas = acp[ts]
    alphas_prev = np.concatenate([[acp[0]], acp[ts[:-1]]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return ts, alphas.astype(np.float32), alphas_prev.astype(np.float32), sigmas.astype(np.float32)
