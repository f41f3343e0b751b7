"""pjit training steps.

The reference's iteration-type state machine (normal recon / arc2face
distill / compositional distill — ddpm.py:484-506, 515-638) is host-side
control flow here: each iteration type is its own compiled step function and
the host picks which to call per step. Inside each step everything is traced
once: t sampling, q_sample, UNet forward, loss, grads, optimizer update.

Provided steps:
  * make_recon_step — masked reconstruction (ddpm.py:2896-2950 +
    calc_recon_loss:3571-3596);
  * make_arc2face_distill_step — Stage-1 distillation from the frozen
    Arc2Face teacher (ddpm.py:2953-3039 + Arc2FaceWrapper:5402-5478): the
    teacher denoises a chain of ND steps; the student (frozen SD UNet,
    conditioned on the AdaFace inverse prompt embeddings produced by the
    trainable SubjBasisGenerator) matches the teacher's noise predictions,
    loss summed over the last few steps / sqrt(ND).

Sharding: batch over 'dp', params replicated or FSDP-sharded
(parallel/mesh.py); grads are all-reduced by GSPMD (the DDP equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaprompt_tpu.models import clip_text, unet as unet_mod
from adaprompt_tpu.sampling.schedule import DiffusionSchedule, SD15_SCHEDULE, q_sample
from adaprompt_tpu.train.losses import calc_recon_loss


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
    """Wrapper over losses.calc_recon_loss with the recon-iter defaults
    (fg weight 1, bg weight 0.1, aug_mask as img_mask)."""
    return calc_recon_loss(eps_pred, eps, aug_mask, fg_mask,
                           fg_pixel_weight=1.0, bg_pixel_weight=bg_weight)


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
        # aug_mask doubles as the self-attention key mask (ddpm.py:2871-2877)
        eps_pred = unet_mod.forward(params, z_t.astype(compute_dtype), t,
                                    batch["context"].astype(compute_dtype),
                                    img_mask=batch.get("aug_mask"),
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


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash -> static jit arg
class FrozenSD:
    """Frozen model params + configs shared by the distillation steps.

    Step functions receive the PARAMS as a runtime argument
    (`frozen_params(frozen)`), not via closure: closure-captured params are
    baked into the lowered program as constants (~2.2GB for full SD-1.5),
    which the remote TPU compiler cannot ingest and which would be
    re-embedded per compiled step variant. Only the configs stay static."""
    unet: dict
    text: dict
    arc2face_text: dict
    teacher_unet: dict
    unet_cfg: unet_mod.UNetConfig
    text_cfg: "clip_text.CLIPTextConfig"
    arc2face_text_cfg: "clip_text.CLIPTextConfig"


def frozen_params(frozen: FrozenSD) -> dict:
    """The runtime-argument pytree passed to every step call."""
    fp = {"unet": frozen.unet, "text": frozen.text,
          "arc2face_text": frozen.arc2face_text}
    if frozen.teacher_unet is not None:
        fp["teacher_unet"] = frozen.teacher_unet
    return fp


def make_arc2face_distill_step(optimizer: optax.GradientTransformation,
                               frozen: FrozenSD, tokenizer, subj_basis_cfg,
                               *, num_denoising_steps: int = 1,
                               sched: DiffusionSchedule = SD15_SCHEDULE,
                               compute_dtype=jnp.bfloat16,
                               skip_weights=(0.5, 0.5),
                               allow_self_teacher: bool = False):
    """Stage-1 Arc2Face distillation step (one compiled variant per ND).

    Trainable pytree: {'subj_basis': SubjBasisGenerator params}.
    batch: {'z0': [B,h,w,4] scaled latents, 'faceid': [B,512] normalized
    ArcFace embeddings, 'fg_mask': [B,h,w,1]|None, 'aug_mask': ...|None,
    'use_image_target': static False when targets are teacher noise preds}.

    Without a real Arc2Face teacher (frozen.teacher_unet is None), the
    chain would distill against the student's own frozen SD UNet — a
    meaningless objective for a real run. That fallback must be requested
    explicitly with allow_self_teacher=True (smoke tests only), mirroring
    the synthetic_faces gate on random face ids.
    """
    if frozen.teacher_unet is None and not allow_self_teacher:
        raise ValueError(
            "arc2face distillation requires a teacher UNet (Arc2Face "
            "checkpoint); pass allow_self_teacher=True only for smoke runs "
            "that knowingly distill the student against its own frozen UNet")
    from adaprompt_tpu.adaface import arc2face as a2f
    from adaprompt_tpu.adaface import subj_basis_generator as sbg
    from adaprompt_tpu.train.arc2face_teacher import teacher_denoise_chain

    nd = num_denoising_steps
    # loss accumulation window (ddpm.py:2960-2968): with batch B, keep the
    # last max(7 // B, 1) steps
    sw = jnp.asarray(np.asarray(skip_weights, np.float32))

    def loss_fn(trainable, fp, batch, key):
        z0 = batch["z0"]
        b = z0.shape[0]
        k_t, k_noise, k_teacher, k_rest = jax.random.split(key, 4)
        t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, z0.shape, jnp.float32)

        # teacher conditioning: arc2face forward embeddings, max_len 21
        # ("remove all paddings", ddpm.py:5427)
        teacher_ctx, core_id = a2f.forward_face_embs(
            fp["arc2face_text"], tokenizer, batch["faceid"],
            text_cfg=frozen.arc2face_text_cfg, input_max_length=21)
        teacher_ctx = jax.lax.stop_gradient(teacher_ctx)
        core_id = jax.lax.stop_gradient(core_id)

        # teacher chain
        noise_preds, pred_x0s, noises, ts = teacher_denoise_chain(
            fp.get("teacher_unet", fp["unet"]), z0, noise, t, teacher_ctx,
            k_teacher, num_denoising_steps=nd, unet_cfg=frozen.unet_cfg,
            sched=sched, compute_dtype=compute_dtype)

        # student conditioning: the AdaFace inverse prompt embeddings
        # ('full_pad' in training) re-encoded by the frozen SD text encoder
        # (the 'arc2face_inverse_clip_iter' path, embedding_manager.py:1583-1592
        # + ddpm.py:1056-1060)
        _, adaface_prompt_embs = sbg.forward(
            trainable["subj_basis"], subj_basis_cfg, tokenizer, core_id,
            is_training=True)
        ids_np, _ = a2f._inverse_template(a2f._tok_key(tokenizer),
                                          frozen.text_cfg.max_positions, None)
        ids = jnp.tile(jnp.asarray(ids_np)[None], (b, 1))
        student_ctx = clip_text.encode(
            fp["text"], ids, cfg=frozen.text_cfg,
            inputs_embeds=adaface_prompt_embs,
            hidden_state_layer_weights=sw)          # [B, 77, 768]

        max_loss_steps = max(7 // b if b > 0 else 1, 1)
        loss_start = max(0, nd - max_loss_steps)

        fg_mask = batch.get("fg_mask")
        img_mask = batch.get("aug_mask")
        losses = []
        for s in range(loss_start, nd):
            # student input: the teacher's pred_x0 of the previous step
            # (s=0 wraps to the last, matching ddpm.py:2985)
            x0_s = pred_x0s[s - 1]
            eps_s = unet_mod.forward(
                fp["unet"],
                q_sample(sched, x0_s, ts[s], noises[s]).astype(compute_dtype),
                ts[s], student_ctx[None].astype(compute_dtype),
                img_mask=img_mask,
                cfg=frozen.unet_cfg).astype(jnp.float32)
            # bg_pixel_weight=0: don't distill teacher-suppressed background
            # (ddpm.py:3017-3024)
            losses.append(calc_recon_loss(eps_s, noise_preds[s], img_mask,
                                          fg_mask, fg_pixel_weight=1.0,
                                          bg_pixel_weight=0.0))
        loss = sum(losses) / np.sqrt(nd)
        return loss, {"loss_arc2face_distill": loss}

    def step(state: TrainState, fp, batch, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, fp, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step
