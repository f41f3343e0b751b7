"""Stage-2 compositional distillation step + host orchestration.

Mirrors the reference flow (ddpm.py:2602-2669 x_start/t setup; 3043-3184
teacher filtering and with-grad re-denoise; 3597-3712 CLIP scoring;
3246-3448 regularizers):

  host per iteration:
    1. fresh iter: t ~ U(0.8T, T); x_start = fg of the training image pasted
       on noise, randomly down-scaled (init_x_with_fg_from_training_image,
       ldm/util.py:2163-2217) — or x_start.normal_() without masks;
       reuse iter: (x_start, t) from cached_inits, t ~ U(0.4T, 0.7T) capped
       at prev_t - 0.15T;
    2. build the 4-type contexts (subj_single, subj_comp, cls_single,
       cls_comp) and their VK mixes;
    3. FILTER phase (no grad, jitted): denoise the candidate comp pairs once,
       decode, CLIP-score against the class comp prompts; teachable iff
       cls loss <= 0.28 and subj-cls margin > 0.002; pick the best candidate;
    4. if teachable, TRAIN phase (jitted): denoise the 4-type batch with
       activation capture; losses = prompt-delta + mix-prompt distill
       (feat/attn) + fg/bg regularizers; optimizer update;
    5. cache the denoised x_recon for a later reuse iteration.

The filter/train phases are pure jitted functions; the cache and iteration
branching are host state (the reference keeps them on `self`).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from adaprompt_tpu.models import unet as unet_mod, vae as vae_mod
from adaprompt_tpu.sampling.schedule import (DiffusionSchedule, SD15_SCHEDULE,
                                             q_sample, predict_start_from_noise)
from adaprompt_tpu.train import compos as compos_mod, fgbg as fgbg_mod
from adaprompt_tpu.train.losses import calc_prompt_emb_delta_loss
from adaprompt_tpu.train.steps import TrainState


def scale_into_canvas(x: jax.Array, scale: float) -> jax.Array:
    """Shrink content by `scale` into the center of a same-sized canvas
    (zeros outside) via bilinear sampling — the fixed-shape equivalent of
    F.interpolate(scale_factor)+pad (ldm/util.py:2188-2205)."""
    b, h, w, c = x.shape
    ys = (np.arange(h) - (h - 1) / 2) / scale + (h - 1) / 2
    xs = (np.arange(w) - (w - 1) / 2) / scale + (w - 1) / 2

    def gather_axis(v, coords, axis):
        lo = np.floor(coords).astype(np.int64)
        frac = (coords - lo).astype(np.float32)
        lo_c = np.clip(lo, 0, v.shape[axis] - 1)
        hi_c = np.clip(lo + 1, 0, v.shape[axis] - 1)
        valid = ((coords >= 0) & (coords <= v.shape[axis] - 1)).astype(np.float32)
        a = jnp.take(v, lo_c, axis=axis)
        bb = jnp.take(v, hi_c, axis=axis)
        shape = [1] * v.ndim
        shape[axis] = -1
        f = jnp.asarray(frac).reshape(shape)
        vl = jnp.asarray(valid).reshape(shape)
        return (a * (1 - f) + bb * f) * vl

    y = gather_axis(x, ys, 1)
    return gather_axis(y, xs, 2)


def init_x_with_fg_from_training_image(x_start: jax.Array, fg_mask: jax.Array,
                                       filtered_fg_mask: jax.Array,
                                       key: jax.Array, fg_rand_scale: float):
    """Paste the (randomly shrunk) foreground of the training latents onto
    noise. fg_rand_scale is sampled host-side (data-dependent on the fg
    percentage, ldm/util.py:2166-2186). Returns (x_start, fg_mask,
    filtered_fg_mask), all [B, h, w, ...] NHWC."""
    noise = jax.random.normal(key, x_start.shape, x_start.dtype)
    x_fg = jnp.where(filtered_fg_mask.astype(bool), x_start, noise)
    stacked = jnp.concatenate([x_fg, fg_mask.astype(x_fg.dtype),
                               filtered_fg_mask.astype(x_fg.dtype)], axis=-1)
    scaled = scale_into_canvas(stacked, fg_rand_scale)
    c = x_start.shape[-1]
    x_s, fg_s, ffg_s = scaled[..., :c], scaled[..., c:c + 1], scaled[..., c + 1:]
    # outside the (shrunk) fg: noise
    key2 = jax.random.fold_in(key, 1)
    noise2 = jax.random.normal(key2, x_start.shape, x_start.dtype)
    x_out = jnp.where(ffg_s.astype(bool), x_s, noise2)
    return x_out, fg_s, ffg_s


def pick_fg_rand_scale(fg_mask_np: np.ndarray, rng: np.random.Generator,
                       base_scale_range=(0.7, 1.0)) -> float:
    """Host-side: the data-dependent random scale (ldm/util.py:2166-2186)."""
    pct = float(fg_mask_np.sum()) / fg_mask_np.size
    lb, ub = base_scale_range
    if pct > 0.1:
        extra = (0.1 / pct) ** 0.35
        lb, ub = lb * extra, max(0.5, ub * extra)
    return float(rng.uniform(lb, ub))


@dataclasses.dataclass(frozen=True, eq=False)
class ComposModels:
    """Static CONFIGS for the compositional phases. The frozen params
    (unet/vae/text towers + the frozen subj-basis copy) are runtime
    arguments `mp` of each phase — closure capture would bake GBs of
    constants into the lowered programs (see steps.FrozenSD)."""
    unet_cfg: unet_mod.UNetConfig
    vae_cfg: vae_mod.VAEConfig


def make_filter_phase(models: ComposModels, *, cfg_scale: float = 5.0,
                      sched: DiffusionSchedule = SD15_SCHEDULE,
                      compute_dtype=jnp.bfloat16):
    """One no-grad denoise of the (subj_comp x N, mix_comp x N) candidate
    batch -> decoded images [-1,1] for CLIP scoring (ddpm.py:3043-3135)."""

    def phase(mp, ctx_v, ctx_k, uncond_ctx, x_start, t, noise):
        """mp: {'unet', 'vae'} frozen params; ctx_v/ctx_k: [L, 2N, S, D];
        x_start/noise: [2N, h, w, 4]; t: [2N]."""
        x_t = q_sample(sched, x_start, t, noise)
        eps_c = unet_mod.forward(mp["unet"], x_t.astype(compute_dtype), t,
                                 ctx_v.astype(compute_dtype),
                                 context_k=ctx_k.astype(compute_dtype),
                                 cfg=models.unet_cfg).astype(jnp.float32)
        if uncond_ctx is not None and cfg_scale > 1:
            eps_u = unet_mod.forward(mp["unet"], x_t.astype(compute_dtype), t,
                                     uncond_ctx.astype(compute_dtype),
                                     cfg=models.unet_cfg).astype(jnp.float32)
            eps = eps_u + cfg_scale * (eps_c - eps_u)
        else:
            eps = eps_c
        x_recon = predict_start_from_noise(sched, x_t, t, eps)
        imgs = vae_mod.decode(mp["vae"], (x_recon / 0.18215).astype(compute_dtype),
                              cfg=models.vae_cfg).astype(jnp.float32)
        return jax.lax.stop_gradient(x_recon), jax.lax.stop_gradient(imgs)

    return jax.jit(phase)


def make_compos_train_phase(optimizer: optax.GradientTransformation,
                            models: ComposModels, context_fn,
                            *, sched: DiffusionSchedule = SD15_SCHEDULE,
                            compute_dtype=jnp.bfloat16,
                            loss_weights: dict | None = None):
    """With-grad denoise of the 4-type batch + distillation losses + update.

    context_fn(trainable, mp, batch) -> dict with:
      'ctx4': [L, 4, S, D] four-type contexts (subj_single, subj_comp,
              cls_single, cls_comp) BEFORE VK mixing,
      'static_embs': [4, L, S, D] for the prompt-delta loss,
      'prompt_emb_mask': [4, S, 1] | None,
      'subj_pos': host token positions of the subject embeddings,
      'bg_pos': host positions of the background embeddings | None.
    batch: {'x_start': [4,h,w,4], 't': [4], 'noise': [4,h,w,4],
            'fg_mask': [1,h0,w0,1]|None,
            'training_percent': [] traced progress scalar in [0,1] driving
            the subj/cls mix-scale anneal (ddpm.py:518-519)}.
    """
    lw = {"prompt_emb_delta": 2e-4, "mix_prompt_distill": 1e-4,
          "comp_fg_bg_preserve": 1e-3, "fg_bg_xlayer_consist": 5e-5}
    lw.update(loss_weights or {})

    def loss_fn(trainable, mp, batch, key):
        cinfo = context_fn(trainable, mp, batch)
        ctx4 = cinfo["ctx4"]
        subj_pos = cinfo["subj_pos"]
        L = ctx4.shape[0]

        subj_ctx = ctx4[:, 0:2]                          # [L, 2, S, D]
        cls_ctx = ctx4[:, 2:4]
        t = batch["t"]
        t_frac = t[2:4].astype(jnp.float32) / sched.num_timesteps
        mix_v, mix_k = compos_mod.mix_static_vk_embeddings(
            subj_ctx, cls_ctx, subj_pos, t_frac,
            batch.get("training_percent", jnp.asarray(0.0, jnp.float32)))
        ctx_v = jnp.concatenate([subj_ctx, mix_v], axis=1)   # [L, 4, S, D]
        ctx_k = jnp.concatenate([subj_ctx, mix_k], axis=1)

        x_t = q_sample(sched, batch["x_start"], t, batch["noise"])
        eps, captures = unet_mod.forward(
            mp["unet"], x_t.astype(compute_dtype), t,
            ctx_v.astype(compute_dtype), context_k=ctx_k.astype(compute_dtype),
            capture_ca=True, cfg=models.unet_cfg)
        x_recon = predict_start_from_noise(sched, x_t, t, eps.astype(jnp.float32))

        outfeats = {li: v.astype(jnp.float32) for li, v in captures["outfeat"].items()}
        attnscores = {li: v.astype(jnp.float32) for li, v in captures["attnscore"].items()}

        # 50% host coin: affine-free LN on outfeats, feat-delta scale x5
        # (ddpm.py:3370-3384; base scale 0.5 under do_zero_shot)
        norm_of = batch.get("normalize_outfeat", jnp.asarray(0.0))
        loss_feat, loss_attn_delta, loss_attn_norm = compos_mod.calc_prompt_mix_loss(
            outfeats, attnscores, subj_pos, block_size=1,
            normalize_outfeat=norm_of)
        feat_scale = 0.5 * (1.0 + 4.0 * jnp.asarray(norm_of, jnp.float32))
        # attn-norm L1 is much smaller in scale; the reference scales it up
        # by ~10 inside p_losses
        loss_mix = (loss_feat * feat_scale + loss_attn_delta
                    + loss_attn_norm * 10.0)

        loss_delta = calc_prompt_emb_delta_loss(cinfo["static_embs"],
                                                cinfo.get("prompt_emb_mask"))

        fg_mask = batch.get("fg_mask")
        loss_fg_x, loss_bg_x = fgbg_mod.calc_fg_bg_xlayer_consist_loss(
            attnscores, subj_pos, cinfo.get("bg_pos"), ssb_size=2)

        # elastic-matching fg/bg preservation (ddpm.py:3272-3368 weighting)
        loss_preserve = jnp.asarray(0.0)
        q_bn_stats: dict = {}
        if fg_mask is not None:
            from adaprompt_tpu.train.elastic import calc_comp_fg_bg_preserve_loss
            qs = {li: v.astype(jnp.float32) for li, v in captures["q"].items()}
            (l_map, l_scss, l_mcms, l_scmc, l_subj_sup, l_mix_sup), q_bn_stats = \
                calc_comp_fg_bg_preserve_loss(outfeats, qs, attnscores,
                                              fg_mask, subj_pos, block_size=1)
            # relative weights within the preserve family follow the
            # reference's comp_fg_bg_preserve aggregation
            loss_preserve = (l_map + l_scss + l_mcms + l_scmc
                             + (l_subj_sup + l_mix_sup) * 10.0)

        loss = (lw["mix_prompt_distill"] * loss_mix
                + lw["prompt_emb_delta"] * loss_delta
                + lw["fg_bg_xlayer_consist"] * (loss_fg_x + loss_bg_x)
                + lw["comp_fg_bg_preserve"] * loss_preserve)
        metrics = {"loss_compos": loss, "loss_mix_prompt_distill": loss_mix,
                   "loss_prompt_emb_delta": loss_delta,
                   "loss_fg_xlayer_consist": loss_fg_x,
                   "loss_bg_xlayer_consist": loss_bg_x,
                   "loss_comp_fg_bg_preserve": loss_preserve}
        return loss, (metrics, x_recon, q_bn_stats)

    def phase(state: TrainState, mp, batch, key):
        (loss, (metrics, x_recon, q_bn_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, mp, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["q_bn_stats"] = q_bn_stats
        return TrainState(params, opt_state, state.step + 1), metrics, \
            jax.lax.stop_gradient(x_recon)

    return jax.jit(phase)


class CachedInits:
    """Host-side cache of denoised x_recon for reuse iterations
    (ddpm.py:2611-2641, 3161-3184)."""

    def __init__(self, num_timesteps: int = 1000):
        self.cache: dict = {}
        self.T = num_timesteps

    def put(self, subject_name: str, x_recon: np.ndarray, t: np.ndarray):
        self.cache[subject_name] = {"x_start": np.asarray(x_recon),
                                    "t": np.asarray(t)}

    def has(self, subject_name: str) -> bool:
        return subject_name in self.cache

    def take(self, subject_name: str, rng: np.random.Generator):
        entry = self.cache.pop(subject_name)
        x_start, prev_t = entry["x_start"], entry["t"]
        t_mid = rng.integers(int(self.T * 0.4), int(self.T * 0.7),
                             size=prev_t.shape)
        t = np.minimum(t_mid, prev_t - int(self.T * 0.15))
        return x_start, np.maximum(t, 0).astype(np.int32)
