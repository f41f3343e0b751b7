"""Elastic-matching compositional fg/bg preservation losses.

Ports of calc_elastic_matching_loss (/root/reference/ldm/util.py:2241-2370)
and calc_comp_fg_bg_preserve_loss (ddpm.py:4389-4560): soft-match the image
tokens of the comp instances onto the single instances via q-feature
similarity, then
  * align the subj-comp->subj-single and mix-comp->mix-single soft maps,
  * reconstruct the subj-single fg features from subj-comp features through
    the map and cosine-match them,
  * cosine-match subj-comp and mix-comp features on inferred-background
    tokens,
  * suppress subject attention on inferred-background tokens of the comp
    instances.

JAX note: the reference boolean-gathers fg columns (dynamic N_fg); here the
same values are computed with binary emb-mask weighting inside
calc_ref_cosine_loss / masked_mean — identical results, static shapes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface.gradient import grad_scale
from adaprompt_tpu.train.losses import calc_ref_cosine_loss
from adaprompt_tpu.train.fgbg import masked_mean, bilinear_resize_torch, resize_mask_for_attn
from adaprompt_tpu.train.compos import _avg_pool, _normalize_weights, FEAT_DISTILL_LAYER_WEIGHTS


def calc_elastic_matching_loss(ca_q, ca_outfeat, fg_mask, *,
                               fg_bg_cutoff_prob: float = 0.25,
                               single_q_grad_scale: float = 0.1,
                               single_feat_grad_scale: float = 0.01,
                               mix_feat_grad_scale: float = 0.05):
    """ca_q/ca_outfeat: [4, C, N] (4-type batch, flattened spatial);
    fg_mask: [1, 1, N] binary. Returns (loss_map_align, loss_sc_ss_fg_match,
    loss_sc_mc_bg_match, sc_bg_prob, mc_bg_prob)."""
    fg = fg_mask.reshape(1, -1)                           # [1, N]
    ss_q, sc_q, ms_q, mc_q = jnp.split(ca_q, 4, axis=0)
    ss_q_gs = grad_scale(ss_q, single_q_grad_scale)
    ms_q_gs = grad_scale(ms_q, single_q_grad_scale)

    # matching probs normalized over the comp dimension
    sc_map_ss = jax.nn.softmax(
        jnp.einsum("bci,bcj->bij", sc_q, ss_q_gs), axis=1)    # [1, Nc, Ns]
    mc_map_ms = jax.nn.softmax(
        jnp.einsum("bci,bcj->bij", mc_q, ms_q_gs), axis=1)

    ss_feat, sc_feat, ms_feat, mc_feat = jnp.split(ca_outfeat, 4, axis=0)

    fg_hw = fg[:, :, None] * fg[:, None, :]
    loss_map_align = masked_mean(jnp.abs(sc_map_ss - mc_map_ms),
                                 fg_hw[:, None] if False else fg_hw)

    # reconstruct subj-single features from subj-comp via the map; compare on
    # fg columns (emb-mask weighting == the reference's column gather)
    sc_recon_ss = jnp.einsum("bcn,bnj->bcj", sc_feat, sc_map_ss)  # [1, C, Ns]
    sc_recon_ss = sc_recon_ss.transpose(0, 2, 1)                   # [1, Ns, C]
    ss_feat_t = ss_feat.transpose(0, 2, 1)
    ss_feat_gs = grad_scale(ss_feat_t, single_feat_grad_scale)
    loss_sc_ss_fg_match = calc_ref_cosine_loss(
        sc_recon_ss, ss_feat_gs, emb_mask=fg[..., None],
        exponent=2, do_demean_first=False, first_n_dims_to_flatten=2,
        ref_grad_scale=1.0)

    # total prob each comp token maps into single-instance fg
    fgf = fg.astype(sc_map_ss.dtype)[..., None]                    # [1, N, 1]
    sc_map_ss_fg_prob = jnp.matmul(sc_map_ss, fgf).transpose(0, 2, 1)  # [1,1,Nc]
    mc_map_ms_fg_prob = jnp.matmul(mc_map_ms, fgf).transpose(0, 2, 1)
    sc_bg_prob = jnp.maximum(fg_bg_cutoff_prob - sc_map_ss_fg_prob, 0.0)
    mc_bg_prob = jnp.maximum(fg_bg_cutoff_prob - mc_map_ms_fg_prob, 0.0)

    loss_sc_mc_bg_match = calc_ref_cosine_loss(
        sc_feat.transpose(0, 2, 1), mc_feat.transpose(0, 2, 1),
        emb_mask=mc_bg_prob.transpose(0, 2, 1),
        exponent=2, do_demean_first=False, first_n_dims_to_flatten=2,
        ref_grad_scale=mix_feat_grad_scale)

    return loss_map_align, loss_sc_ss_fg_match, loss_sc_mc_bg_match, \
        sc_bg_prob, mc_bg_prob


def calc_comp_fg_bg_preserve_loss(ca_outfeats: dict, ca_qs: dict,
                                  ca_attnscores: dict, fg_mask: jax.Array,
                                  subj_pos, block_size: int = 1,
                                  normalize_q_outfeat: bool = True):
    """ddpm.py:4389-4560 over our captures.

    ca_outfeats: {layer: [4B, H, W, C]}; ca_qs: {layer: [4B, heads, N, d]}
    (our UNet q capture); ca_attnscores: {layer: [4B, heads, Q, 77]};
    fg_mask: [B, H0, W0, 1]; subj_pos: K subject token positions.

    With normalize_q_outfeat (normalize_ca_q_and_outfeat=True in the
    reference config, ddpm.py:3295-3300), q features pass through an
    affine-free batch-stat BatchNorm (the embedding_manager's ca_q_bns,
    embedding_manager.py:1205-1215) and outfeats through an affine-free
    LayerNorm (ca_outfeat_lns) before matching.

    Returns ((loss_comp_single_map_align, loss_sc_ss_fg_match,
              loss_mc_ms_fg_match(=0), loss_sc_mc_bg_match,
              loss_comp_subj_bg_attn_suppress,
              loss_comp_mix_bg_attn_suppress),
             q_bn_stats: {layer: (mean[C], var[C])} batch statistics for the
             trainer's ca_q_bns running-stat bookkeeping).
    """
    zero = jnp.asarray(0.0)
    q_bn_stats: dict = {}
    if fg_mask is None:
        return (zero,) * 6, q_bn_stats
    w = _normalize_weights(FEAT_DISTILL_LAYER_WEIGHTS)
    mix_gs = 0.02

    l_map, l_scss, l_scmc, l_subj_sup, l_mix_sup = [], [], [], [], []

    for li, outfeat in ca_outfeats.items():
        if li not in w or li not in ca_qs:
            continue
        lw = w[li]
        # q: [4B, heads, N, d] -> [4B, heads*d, h, w]
        q = ca_qs[li]
        b4, heads, n, d = q.shape
        qh = int(np.sqrt(n))
        q_sp = q.transpose(0, 1, 3, 2).reshape(b4, heads * d, qh, qh)
        # NHWC for resizing/pooling
        q_sp = q_sp.transpose(0, 2, 3, 1)
        if normalize_q_outfeat:
            # ca_q_bns: BatchNorm2d(affine=False) in train mode — normalize
            # per channel with batch statistics (ddpm.py:4442-4443)
            q_mean = jnp.mean(q_sp, axis=(0, 1, 2))
            q_var = jnp.var(q_sp, axis=(0, 1, 2))
            # running stats use the unbiased variance (torch BN semantics);
            # the normalization itself uses the biased one
            n = q_sp.shape[0] * q_sp.shape[1] * q_sp.shape[2]
            q_bn_stats[li] = (jax.lax.stop_gradient(q_mean),
                              jax.lax.stop_gradient(q_var * n / max(n - 1, 1)))
            q_sp = (q_sp - q_mean) * jax.lax.rsqrt(q_var + 1e-5)

        of = outfeat
        if of.shape[1:3] != q_sp.shape[1:3]:
            of = bilinear_resize_torch(of, q_sp.shape[1:3])
        if normalize_q_outfeat:
            # ca_outfeat_lns: LayerNorm(elementwise_affine=False) over
            # channels (ddpm.py:4449-4450)
            of_mean = jnp.mean(of, axis=-1, keepdims=True)
            of_var = jnp.var(of, axis=-1, keepdims=True)
            of = (of - of_mean) * jax.lax.rsqrt(of_var + 1e-5)

        pool = (lambda x: _avg_pool(x, 4, 2)) if of.shape[1] > 8 else (lambda x: x)
        q_pooled = pool(q_sp)
        of_pooled = pool(of)
        hp = q_pooled.shape[1]
        q_flat = q_pooled.reshape(b4, -1, q_pooled.shape[-1]).transpose(0, 2, 1)   # [4B, C, N]
        of_flat = of_pooled.reshape(b4, -1, of_pooled.shape[-1]).transpose(0, 2, 1)

        fg4 = resize_mask_for_attn(fg_mask[:block_size], of.shape[1])
        fg_pooled = pool(fg4).reshape(1, 1, -1)
        fg_bin = (fg_pooled > 1e-6).astype(jnp.float32)
        any_fg = (fg_bin.sum() > 0).astype(jnp.float32)

        (loss_map, loss_scss, loss_scmc, sc_bg_prob, mc_bg_prob) = \
            calc_elastic_matching_loss(q_flat, of_flat, fg_bin)
        l_map.append(loss_map * lw * any_fg)
        l_scss.append(loss_scss * lw * any_fg)
        l_scmc.append(loss_scmc * lw * any_fg)

        # attention fg/bg suppression on inferred-bg tokens
        attn = ca_attnscores[li]
        pos = jnp.asarray(subj_pos)
        subj_attn = attn[:, :, :, pos].sum(axis=-1)          # [4B, heads, Q]
        hh = int(np.sqrt(subj_attn.shape[-1]))
        sa = subj_attn.reshape(b4, subj_attn.shape[1], hh, hh).transpose(0, 2, 3, 1)
        if sa.shape[1:3] != of.shape[1:3]:
            sa = bilinear_resize_torch(sa, of.shape[1:3])
        sa = pool(sa).reshape(b4, -1, sa.shape[-1]).transpose(0, 2, 1)  # [4B, heads, N]
        ss_a, sc_a, ms_a, mc_a = jnp.split(sa, 4, axis=0)
        mc_a_gs = grad_scale(mc_a, mix_gs)
        l_subj_sup.append(masked_mean(jnp.maximum(sc_a, 0), sc_bg_prob)
                          * lw * any_fg)
        l_mix_sup.append(masked_mean(jnp.maximum(mc_a_gs, 0), mc_bg_prob)
                         * lw * any_fg)

    s = lambda xs: sum(xs) if xs else zero
    return (s(l_map), s(l_scss), zero, s(l_scmc),
            s(l_subj_sup), s(l_mix_sup)), q_bn_stats
