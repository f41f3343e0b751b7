"""pjit training steps.

The reference's iteration-type state machine (normal recon / arc2face
distill / compositional distill — ddpm.py:484-506, 515-638) is host-side
control flow here: each iteration type is its own compiled step function and
the host picks which to call per step. Inside each step everything is traced
once: t sampling, q_sample, UNet forward, loss, grads, optimizer update.

This module currently provides the masked-reconstruction step (Stage-1
recon iters, ddpm.py:2896-2950 + calc_recon_loss:3571-3596); the distillation
steps land with the AdaFace training stack.

Sharding: batch over 'dp', params replicated or FSDP-sharded
(parallel/mesh.py); grads are all-reduced by GSPMD (the DDP equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from adaprompt_tpu.models import unet as unet_mod
from adaprompt_tpu.sampling.schedule import DiffusionSchedule, SD15_SCHEDULE, q_sample


@dataclasses.dataclass
class TrainState:
    params: Any          # trainable pytree
    opt_state: Any
    step: jax.Array


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda aux, children: TrainState(*children))


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def masked_recon_loss(eps_pred: jax.Array, eps: jax.Array,
                      fg_mask: jax.Array | None, aug_mask: jax.Array | None,
                      bg_weight: float = 0.1) -> jax.Array:
    """fg/bg-weighted MSE over latents (ddpm.py recon loss semantics:
    full weight on subject foreground, discounted background; aug_mask zeros
    padding introduced by augmentation)."""
    se = (eps_pred.astype(jnp.float32) - eps.astype(jnp.float32)) ** 2
    if fg_mask is None:
        w = jnp.ones_like(se[..., :1])
    else:
        w = fg_mask + bg_weight * (1.0 - fg_mask)
    if aug_mask is not None:
        w = w * aug_mask
    return jnp.sum(se * w) / (jnp.sum(w) * se.shape[-1] + 1e-8)


def make_recon_step(optimizer: optax.GradientTransformation,
                    unet_cfg: unet_mod.UNetConfig = unet_mod.SD15_UNET_CONFIG,
                    sched: DiffusionSchedule = SD15_SCHEDULE,
                    context_fn: Callable | None = None,
                    compute_dtype=jnp.bfloat16):
    """Build a jittable recon train step.

    The trainable pytree is the UNet params by default; when `context_fn`
    is given (signature: trainable_extra, batch -> context [L,B,S,D]) the
    step instead trains whatever produces the context (the AdaFace case:
    the subject-basis generator) with a frozen UNet — pass the frozen UNet
    params via batch['unet_params'] closure at jit time.

    step(state, batch, key) -> (state, metrics) with
      batch = {'z0': [B,h,w,4] scaled latents, 'context': [L,B,S,D],
               'fg_mask': [B,h,w,1] | None, 'aug_mask': ... | None}
    """

    def loss_fn(params, batch, key):
        z0 = batch["z0"]
        b = z0.shape[0]
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (b,), 0, sched.num_timesteps)
        eps = jax.random.normal(kn, z0.shape, jnp.float32)
        z_t = q_sample(sched, z0, t, eps)
        eps_pred = unet_mod.forward(params, z_t.astype(compute_dtype), t,
                                    batch["context"].astype(compute_dtype),
                                    cfg=unet_cfg)
        loss = masked_recon_loss(eps_pred, eps, batch.get("fg_mask"),
                                 batch.get("aug_mask"))
        return loss, {"loss_recon": loss}

    def step(state: TrainState, batch, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step
