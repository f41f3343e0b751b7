"""Compositional ("mix prompt") distillation — the Stage-2 machinery.

JAX ports of:
  * mix_static_vk_embeddings (/root/reference/ldm/util.py:1683-1821): build
    the mixed class-prompt V/K contexts — the class embedding at the subject
    token positions is blended with the subject embedding per layer (V: cls
    scale 1.0 -> 0.7 over the sync layers, K: 1.0), then the whole mixed
    context is blended with the subject context by a t-dependent layer mask
    (diffusion w.r.t. subject-embedding proportion), grad-scaled 0.05;
  * calc_delta_alignment_loss (ldm/util.py:543-597);
  * convert_attn_to_spatial_weight (ldm/util.py:648-682);
  * calc_prompt_mix_loss (ddpm.py:3714-3930): feature-delta alignment,
    subject-attention delta alignment, and attention-norm distillation over
    the captured cross-attention activations of the 4-type batch
    (subj_single, subj_comp, mix_single, mix_comp);
  * the CLIP teacher-filter operating point (ddpm.py:3649-3664).

Layout notes: our UNet captures are NHWC outfeats [4B, H, W, C] and
attention scores [4B, heads, Q, 77]; the reference uses NCHW / [4B, heads,
Q, 77]. The 4-type batch is ordered (subj_single, subj_comp, mix_single,
mix_comp) along axis 0, BLOCK_SIZE instances per type.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface.gradient import grad_scale
from adaprompt_tpu.train.losses import (calc_ref_cosine_loss, ortho_subtract)

SYNC_LAYER_CA_INDICES = (4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)  # CA idx of layers 7..24

FEAT_DISTILL_LAYER_WEIGHTS = {7: 0.5, 8: 0.5, 12: 1., 16: 1., 17: 1., 18: 1.,
                              19: 1., 20: 1., 21: 1., 22: 1., 23: 1., 24: 1.}
ATTN_DELTA_LAYER_WEIGHTS = dict(FEAT_DISTILL_LAYER_WEIGHTS)
ATTN_NORM_LAYER_WEIGHTS = dict(FEAT_DISTILL_LAYER_WEIGHTS)
FEAT_SIZE2POOLER_SPEC = {8: (4, 2), 16: (4, 2), 32: (8, 4), 64: (8, 4)}

# teacher-filter operating point (ddpm.py:3649-3664)
CLIP_LOSS_THRESHOLD = 0.28
CLIP_LOSS_MARGIN = 0.002


def _normalize_weights(d):
    s = sum(d.values())
    return {k: v / s for k, v in d.items()}


def layer_cls_mix_scales(bs: int, scale_range, n_ca_layers: int = 16,
                         sync_layers=SYNC_LAYER_CA_INDICES) -> jnp.ndarray:
    """[BS, L] per-layer class-emb mix scales (gen_emb_mixer,
    ldm/util.py:1683-1715)."""
    first, final = scale_range
    scales = np.ones((bs, n_ca_layers), np.float32)
    step = (final - first) / (len(sync_layers) - 1)
    scales[:, list(sync_layers)] = first + np.arange(len(sync_layers)) * step
    return jnp.asarray(scales)


def _mix_at_indices(cls_emb, subj_emb, subj_pos, cls_scales):
    """cls everywhere except at subject token positions, where
    cls*scale + subj*(1-scale). Shapes [L,B,S,D]; cls_scales [B,L]."""
    L, B, S, D = cls_emb.shape
    scale = jnp.ones((L, B, S, 1), cls_emb.dtype)
    sc = cls_scales.T[:, :, None, None]  # [L,B,1,1]
    pos = jnp.asarray(subj_pos)
    scale = scale.at[:, :, pos].set(jnp.broadcast_to(sc, (L, B, pos.shape[0], 1)))
    return cls_emb * scale + subj_emb * (1.0 - scale)


def mix_static_vk_embeddings(subj_emb: jax.Array, cls_emb: jax.Array,
                             subj_pos, t_frac: jax.Array,
                             training_percent: float,
                             *, k_cls_scale_range=(1.0, 1.0),
                             v_cls_scale_range=(1.0, 0.7),
                             sync_layers=SYNC_LAYER_CA_INDICES,
                             prompt_mix_grad_scale: float = 0.05):
    """Inputs [L, B, S, D] (subject / class contexts of the same prompts),
    subj_pos: token positions of the subject embeddings (host list),
    t_frac: [B] t/T fractions.

    Returns (mix_v, mix_k) each [L, B, S, D] — the V and K contexts to use
    for the mix (class) half of the compositional batch. (The subject half
    keeps subj_emb for both.)
    """
    L, B, S, D = subj_emb.shape
    v_scales = layer_cls_mix_scales(B, v_cls_scale_range, L, sync_layers)
    k_scales = layer_cls_mix_scales(B, k_cls_scale_range, L, sync_layers)
    mix_v = _mix_at_indices(cls_emb, subj_emb, subj_pos, v_scales)
    mix_k = _mix_at_indices(cls_emb, subj_emb, subj_pos, k_scales)
    mix_v = grad_scale(mix_v, prompt_mix_grad_scale)
    mix_k = grad_scale(mix_k, prompt_mix_grad_scale)

    # t-dependent layer mask: selected layers take
    # 1 - t_frac*(1 - training_percent*0.3) of the SUBJECT embedding
    lm = np.zeros((L,), np.float32)
    lm[list(sync_layers)] = 1.0
    lm = jnp.asarray(lm)[:, None, None, None]                    # [L,1,1,1]
    subj_frac = 1.0 - t_frac[None, :, None, None] * (1.0 - training_percent * 0.3)
    layer_mask = lm * subj_frac                                   # [L,B,1,1]

    out_v = subj_emb * layer_mask + mix_v * (1.0 - layer_mask)
    out_k = subj_emb * layer_mask + mix_k * (1.0 - layer_mask)
    return out_v, out_k


# ---------------------------------------------------------------------------
# Mix-prompt distillation losses
# ---------------------------------------------------------------------------

def calc_delta_alignment_loss(feat_base, feat_ex, ref_feat_base, ref_feat_ex,
                              *, ref_grad_scale=0.1, feat_base_grad_scale=0.05,
                              cosine_exponent=2.0,
                              delta_types=("feat_to_ref", "ex_to_base")):
    """ldm/util.py:543-597. Returns {delta_type: loss}."""
    rb = grad_scale(ref_feat_base, ref_grad_scale)
    re = grad_scale(ref_feat_ex, ref_grad_scale)
    if feat_base_grad_scale == -1:
        feat_base_grad_scale = min(ref_grad_scale / 2, 1)
    fb = grad_scale(feat_base, feat_base_grad_scale)

    out = {}
    for dt in delta_types:
        if dt == "feat_to_ref":
            src = ortho_subtract(fb, rb)
            tgt = ortho_subtract(feat_ex, re)
        elif dt == "ex_to_base":
            src = ortho_subtract(re, rb)
            tgt = ortho_subtract(feat_ex, fb)
        else:
            raise ValueError(dt)
        out[dt] = calc_ref_cosine_loss(
            tgt, src, exponent=cosine_exponent, do_demean_first=False,
            first_n_dims_to_flatten=feat_base.ndim - 1, ref_grad_scale=1.0,
            aim_to_align=True)
    return out


def convert_attn_to_spatial_weight(flat_attn, bs: int, out_hw, reversed: bool = True):
    """ldm/util.py:648-682. flat_attn [bs*n_occ, heads, Q] (detached) ->
    spatial weight [bs, H, W, 1] (NHWC)."""
    flat_attn = jax.lax.stop_gradient(flat_attn)
    n = flat_attn.shape[-1]
    h, w = out_hw
    scale = np.sqrt(n / (h * w))
    h2, w2 = int(h * scale), int(w * scale)
    from adaprompt_tpu.train.fgbg import bilinear_resize_torch
    sa = flat_attn.reshape(bs, -1, flat_attn.shape[-2], n)
    sa = sa.mean(axis=2).sum(axis=1).reshape(bs, h2, w2, 1)
    sa = bilinear_resize_torch(sa, (h, w))
    mean = sa.mean(axis=(1, 2), keepdims=True)
    std = sa.std(axis=(1, 2), keepdims=True)
    denom = jnp.maximum(std + 0.001, mean / 2)
    m = -1.0 if reversed else 1.0
    wgt = jnp.minimum(jnp.exp(m * (sa - mean) / denom), 1.0)
    wgt = wgt / wgt.mean(axis=(1, 2), keepdims=True)
    return wgt, sa


def _avg_pool(x, kernel: int, stride: int):
    """torch AvgPool2d(kernel, stride) on NHWC."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kernel, kernel, 1), (1, stride, stride, 1),
        "VALID") / (kernel * kernel)


def select_subj_attn(attnscore, subj_pos, k_fg: int):
    """attnscore [4B, heads, Q, 77] + K subject token positions ->
    summed subject attention [4B, heads, Q]."""
    pos = jnp.asarray(subj_pos)
    sel = attnscore[:, :, :, pos]              # [4B, heads, Q, K]
    return sel.sum(axis=-1)


def calc_prompt_mix_loss(ca_outfeats: dict, ca_attnscores: dict, subj_pos,
                         block_size: int = 1,
                         normalize_outfeat: jax.Array | float = 0.0):
    """ddpm.py:3714-3930 over our NHWC captures.

    ca_outfeats: {layer_idx: [4B, H, W, C]}; ca_attnscores:
    {layer_idx: [4B, heads, Q, 77]}; subj_pos: K subject token positions
    (same for all 4 blocks — same_subject_in_batch).

    normalize_outfeat: traced 0/1 scalar — the reference applies an
    affine-free LayerNorm (ca_outfeat_lns) to the outfeats with probability
    0.5 per iteration (ddpm.py:3371-3384); the caller draws the coin on the
    host and scales feat_delta_align by 5x when set.

    Returns (loss_feat_delta_align, loss_subj_attn_delta_align,
             loss_subj_attn_norm_distill).
    """
    feat_w = _normalize_weights(FEAT_DISTILL_LAYER_WEIGHTS)
    attn_delta_w = _normalize_weights(ATTN_DELTA_LAYER_WEIGHTS)
    attn_norm_w = _normalize_weights(ATTN_NORM_LAYER_WEIGHTS)

    mix_feat_gs, mix_attn_gs = 0.1, 0.05
    l_attn_delta, l_feat_delta, l_attn_norm = [], [], []
    norm_flag = jnp.asarray(normalize_outfeat, jnp.float32)

    for li, outfeat in ca_outfeats.items():
        if li not in feat_w and li not in attn_norm_w:
            continue
        of_mean = jnp.mean(outfeat, axis=-1, keepdims=True)
        of_var = jnp.var(outfeat, axis=-1, keepdims=True)
        of_ln = (outfeat - of_mean) * jax.lax.rsqrt(of_var + 1e-5)
        outfeat = norm_flag * of_ln + (1.0 - norm_flag) * outfeat

        attnscore = ca_attnscores[li]
        k_fg = jnp.asarray(subj_pos).shape[0]
        subj_attn = select_subj_attn(attnscore, subj_pos, k_fg)  # [4B, h, Q]
        ss_a, sc_a, ms_a, mc_a = jnp.split(subj_attn, 4, axis=0)

        if li in attn_norm_w:
            mc_gs = grad_scale(mc_a, mix_attn_gs)
            ms_gs = grad_scale(ms_a, mix_attn_gs)
            if attn_delta_w.get(li, 0) > 0:
                d = calc_delta_alignment_loss(
                    ss_a, sc_a, ms_a, mc_a, ref_grad_scale=mix_attn_gs,
                    feat_base_grad_scale=1.0, cosine_exponent=3.0,
                    delta_types=("feat_to_ref",))
                l_attn_delta.append(d["feat_to_ref"] * attn_delta_w[li])
            comp_norm = jnp.abs(sc_a.mean(-1) - mc_gs.mean(-1)).mean()
            single_norm = jnp.abs(ss_a.mean(-1) - ms_gs.mean(-1)).mean()
            l_attn_norm.append((comp_norm + single_norm) * attn_norm_w[li])

        if li not in feat_w:
            continue

        h, w = outfeat.shape[1:3]
        sw_mix, _ = convert_attn_to_spatial_weight(mc_a, block_size, (h, w))
        sw_subj, _ = convert_attn_to_spatial_weight(sc_a, block_size, (h, w))
        sw = (sw_mix + sw_subj) / 2
        sw4 = jnp.tile(sw, (4, 1, 1, 1))
        of = outfeat * sw4

        if h in FEAT_SIZE2POOLER_SPEC:
            kernel, stride = FEAT_SIZE2POOLER_SPEC[h]
        else:
            # non-SD feature sizes (tiny test configs): proportional pooling
            kernel, stride = max(2, h // 4), max(1, h // 8)
        pooled = _avg_pool(of, kernel, stride)
        flat = pooled.reshape(pooled.shape[0], -1)
        ss_f, sc_f, ms_f, mc_f = jnp.split(flat, 4, axis=0)
        ms_f = grad_scale(ms_f, mix_feat_gs)
        mc_f = grad_scale(mc_f, mix_feat_gs)
        comp_delta = ortho_subtract(sc_f, mc_f)
        single_delta = ortho_subtract(ss_f, ms_f)
        resid = ortho_subtract(comp_delta, single_delta)
        l_feat_delta.append(jnp.mean(resid * resid) * feat_w[li])

    zero = jnp.asarray(0.0, jnp.float32)
    return (sum(l_feat_delta) if l_feat_delta else zero,
            sum(l_attn_delta) if l_attn_delta else zero,
            sum(l_attn_norm) if l_attn_norm else zero)


def clip_teachability(clip_loss_cls_comp: jax.Array,
                      clip_loss_subj_comp: jax.Array):
    """Teacher filter (ddpm.py:3649-3664): teachable iff the class-prompt
    CLIP loss <= 0.28 and (subj_loss - cls_loss) > 0.002."""
    return (clip_loss_cls_comp <= CLIP_LOSS_THRESHOLD) & \
           (clip_loss_subj_comp - clip_loss_cls_comp > CLIP_LOSS_MARGIN)


def select_teachable_candidate(loss_subj_comp, loss_cls_comp):
    """N-candidate teacher selection (calc_clip_losses, ddpm.py:3652-3681):
    per-candidate teachability via clip_teachability; among teachable
    candidates pick the one with the LARGEST subj-cls loss margin
    (non-teachable margins are forced to -1e4 before the argmax).

    Args: per-candidate losses [N]. Returns (is_teachable: bool,
    best_cand_idx: int) — host values."""
    import numpy as np
    loss_subj = np.asarray(loss_subj_comp, np.float64).reshape(-1)
    loss_cls = np.asarray(loss_cls_comp, np.float64).reshape(-1)
    diffs = loss_subj - loss_cls
    teachable = (loss_cls <= CLIP_LOSS_THRESHOLD) & (diffs > CLIP_LOSS_MARGIN)
    if not teachable.any():
        return False, 0
    return True, int(np.argmax(np.where(teachable, diffs, -1e4)))
