"""Foreground/background attention regularizers.

JAX ports of the reference attention-regularization family:
  * calc_fg_mb_suppress_loss (ddpm.py:3932-4040): suppress subject-token
    attention on mask-background locations (margin 0.4 below the average
    foreground score);
  * calc_fg_bg_complementary_loss (ddpm.py:4043-4255): push background-token
    attention to be orthogonal to subject-token attention, plus the mf/mb
    margin-contrast terms;
  * calc_fg_bg_xlayer_consist_loss (ddpm.py:4259-4380): align each layer's
    subject/background attention map with the layer below it (cosine with
    demean, bilinear downsampling to the smaller grid);
  * masked_mean / resize_mask_for_feat_or_attn (ldm/util.py:1450-1594).

Attention-score captures are [B, heads, Q, 77] (ours); token selections sum
over the K embeddings of the subject/background placeholder.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface.gradient import grad_scale
from adaprompt_tpu.train.losses import calc_ref_cosine_loss

ATTN_ALIGN_LAYER_WEIGHTS = {7: 0.5, 8: 0.5, 12: 1., 16: 1., 17: 1., 18: 1.,
                            19: 1., 20: 1., 21: 1., 22: 1., 23: 1., 24: 1.}
XLAYER_WEIGHTS = {8: 0.5, 12: 1., 16: 1., 17: 1., 18: 1., 19: 0.5, 20: 0.5,
                  21: 0.5, 22: 0.25, 23: 0.25, 24: 0.25}
XLAYER_MAPS = {8: 7, 12: 8, 16: 12, 17: 16, 18: 17, 19: 18, 20: 19, 21: 20,
               22: 21, 23: 22, 24: 23}


def _norm_w(d):
    s = sum(d.values())
    return {k: v / s for k, v in d.items()}


def bilinear_resize_torch(x: jax.Array, out_hw: tuple) -> jax.Array:
    """torch F.interpolate(mode='bilinear', align_corners=False) semantics —
    point-sampled bilinear WITHOUT antialiasing (jax.image.resize antialiases
    on downsampling, which diverges from the reference). x: [B, H, W, C]."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x

    def axis_weights(in_size, out_size):
        src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        src = np.clip(src, 0, in_size - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = (src - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h, oh)
    xlo, xhi, xf = axis_weights(w, ow)
    yf = jnp.asarray(yf)[None, :, None, None]
    xf = jnp.asarray(xf)[None, None, :, None]
    top = x[:, ylo][:, :, xlo] * (1 - xf) + x[:, ylo][:, :, xhi] * xf
    bot = x[:, yhi][:, :, xlo] * (1 - xf) + x[:, yhi][:, :, xhi] * xf
    return top * (1 - yf) + bot * yf


def masked_mean(ts, mask, axis=None, keepdims=False):
    if mask is None:
        return jnp.mean(ts)
    mask = jnp.broadcast_to(mask.astype(ts.dtype), ts.shape)
    denom = jnp.maximum(jnp.sum(mask, axis=axis, keepdims=keepdims), 1e-6)
    return jnp.sum(ts * mask, axis=axis, keepdims=keepdims) / denom


def resize_mask_for_attn(mask: jax.Array, target_hw: int) -> jax.Array:
    """fg_mask [B, H0, W0, 1] -> [B, target, target, 1], max(nearest,
    bilinear) (resize_mask_for_feat_or_attn, ldm/util.py:1570-1594)."""
    from adaprompt_tpu.models.vae import _resize_mask_nearest
    near = _resize_mask_nearest(mask, (target_hw, target_hw))
    bili = bilinear_resize_torch(mask.astype(jnp.float32),
                                 (target_hw, target_hw))
    return jnp.maximum(near.astype(jnp.float32), bili)


def _select_score(attnscore, pos):
    """[B, heads, Q, 77] + K token positions -> summed [B, heads, Q].

    pos may be [K] (shared across rows — the compos 1-block case) or [B, K]
    per-row positions (recon batches, where each caption places the subject
    tokens differently)."""
    pos = jnp.asarray(pos)
    if pos.ndim == 2:
        b = attnscore.shape[0]
        idx = pos[:b, None, None, :]
        idx = jnp.broadcast_to(idx, attnscore.shape[:3] + (pos.shape[-1],))
        return jnp.take_along_axis(attnscore, idx, axis=-1).sum(axis=-1)
    return attnscore[:, :, :, pos].sum(axis=-1)


def _margin_excess_mean(score, margin, avg_ref):
    excess = score + margin - avg_ref
    return masked_mean(excess, excess > 0)


def _fg_bg_masks(subj_score, fg_mask, block_size):
    """Returns (fg3, bg3, valid): valid==0 reproduces the reference's
    layer skip when any instance has an all-zero fg or bg mask
    (ddpm.py:4163-4170)."""
    hw = int(np.sqrt(subj_score.shape[-1]))
    m = resize_mask_for_attn(fg_mask, hw)           # [B, hw, hw, 1]
    m = m.reshape(block_size, 1, hw * hw)
    m = jnp.broadcast_to(m, subj_score.shape)
    fg3 = (m > 1e-6).astype(jnp.float32)
    bg3 = 1.0 - fg3
    valid = ((fg3.sum(axis=(1, 2)) > 0).all() & (bg3.sum(axis=(1, 2)) > 0).all()).astype(jnp.float32)
    return fg3, bg3, valid


def calc_fg_mb_suppress_loss(ca_attnscores: dict, subj_pos, block_size: int,
                             fg_mask: jax.Array | None) -> jax.Array:
    """ddpm.py:3932-4040."""
    if fg_mask is None:
        return jnp.asarray(0.0)
    w = _norm_w(ATTN_ALIGN_LAYER_WEIGHTS)
    scale, margin = 0.05, 0.4
    losses = []
    for li, score in ca_attnscores.items():
        if li not in w:
            continue
        subj = _select_score(score[:block_size], subj_pos)
        fg3, bg3, valid = _fg_bg_masks(subj, fg_mask[:block_size], block_size)
        s_mf = grad_scale(subj * fg3, 0.5)
        s_mb = subj * bg3
        avg_mf = masked_mean(s_mf, fg3, axis=(1, 2), keepdims=True)
        losses.append(_margin_excess_mean(s_mb, margin, avg_mf) * w[li] * scale * valid)
    return sum(losses) if losses else jnp.asarray(0.0)


def calc_fg_bg_complementary_loss(ca_attnscores: dict, subj_pos, bg_pos,
                                  block_size: int, *, fg_grad_scale: float = 0.1,
                                  fg_mask: jax.Array | None = None):
    """ddpm.py:4043-4255. Returns (loss_fg_bg_complementary,
    loss_subj_mb_suppress, loss_bg_mf_suppress, loss_fg_bg_mask_contrast)."""
    zero = jnp.asarray(0.0)
    if subj_pos is None:
        return zero, zero, zero, zero
    if bg_pos is None:
        return zero, calc_fg_mb_suppress_loss(ca_attnscores, subj_pos,
                                              block_size, fg_mask), zero, zero

    w = _norm_w(ATTN_ALIGN_LAYER_WEIGHTS)
    k_fg = jnp.asarray(subj_pos).shape[0]
    k_bg = jnp.asarray(bg_pos).shape[0]
    subj_mb_scale, bg_mf_scale, contrast_scale = 0.05, 0.1, 0.05
    mfmb_margin = 0.4
    subj_bg_at_mf_margin = 0.4 * k_fg / k_bg
    bg_subj_at_mb_margin = 0.4

    l_comple, l_subj_mb, l_bg_mf, l_contrast = [], [], [], []
    for li, score in ca_attnscores.items():
        if li not in w:
            continue
        subj = _select_score(score[:block_size], subj_pos)   # [B, h, Q]
        bg = _select_score(score[:block_size], bg_pos)
        l_comple.append(calc_ref_cosine_loss(
            bg, subj, exponent=2, do_demean_first=False,
            first_n_dims_to_flatten=2, ref_grad_scale=fg_grad_scale,
            aim_to_align=False) * w[li])

        if fg_mask is None:
            continue
        fg3, bg3, valid = _fg_bg_masks(subj, fg_mask[:block_size], block_size)
        s_mf = grad_scale(subj * fg3, 0.5)
        b_mf = bg * fg3
        s_mb = subj * bg3
        b_mb = bg * bg3
        avg_s_mf = masked_mean(s_mf, fg3, axis=(1, 2), keepdims=True)
        avg_b_mb = masked_mean(b_mb, bg3, axis=(1, 2), keepdims=True)

        l_subj_mb.append(_margin_excess_mean(s_mb, mfmb_margin, avg_s_mf)
                         * w[li] * subj_mb_scale * valid)
        l_bg_mf.append(_margin_excess_mean(b_mf, mfmb_margin, avg_b_mb)
                       * w[li] * bg_mf_scale * valid)
        c1 = _margin_excess_mean(b_mf, subj_bg_at_mf_margin, avg_s_mf)
        c2 = _margin_excess_mean(s_mb, bg_subj_at_mb_margin, avg_b_mb)
        l_contrast.append((c1 + c2) * w[li] * contrast_scale * valid)

    s = lambda xs: sum(xs) if xs else zero
    return s(l_comple), s(l_subj_mb), s(l_bg_mf), s(l_contrast)


def calc_fg_bg_xlayer_consist_loss(ca_attnscores: dict, subj_pos, bg_pos,
                                   ssb_size: int):
    """ddpm.py:4259-4380. Returns (loss_fg_xlayer, loss_bg_xlayer)."""
    w = _norm_w(XLAYER_WEIGHTS)
    zero = jnp.asarray(0.0)
    l_fg, l_bg = [], []

    def layer_attn(score, pos):
        # mean over heads, sum over K -> [SSB, Q]; pos [K] shared or [B, K]
        # per-row (see _select_score)
        return _select_score(score[:ssb_size], pos).mean(axis=1)

    for li, score in ca_attnscores.items():
        if li not in w or XLAYER_MAPS.get(li) not in ca_attnscores:
            continue
        score_x = ca_attnscores[XLAYER_MAPS[li]]

        def pair_loss(pos):
            a = layer_attn(score, pos)
            b = layer_attn(score_x, pos)
            if b.shape[-1] > a.shape[-1]:
                a, b = b, a
            h = int(np.sqrt(a.shape[-1]))
            hx = int(np.sqrt(b.shape[-1]))
            a2 = bilinear_resize_torch(a.reshape(ssb_size, h, h, 1), (hx, hx))
            a2 = a2.reshape(ssb_size, hx * hx)
            return calc_ref_cosine_loss(a2, b, exponent=2, do_demean_first=True,
                                        first_n_dims_to_flatten=1,
                                        ref_grad_scale=1.0, aim_to_align=True)

        l_fg.append(pair_loss(subj_pos) * w[li])
        if bg_pos is not None:
            l_bg.append(pair_loss(bg_pos) * w[li])

    return (sum(l_fg) if l_fg else zero, sum(l_bg) if l_bg else zero)
