"""Training losses.

JAX ports of the reference loss math:
  * ortho_subtract (/root/reference/ldm/util.py:280-318): remove from `a` its
    projection onto `b`;
  * demean (ldm/util.py:425-434);
  * calc_ref_cosine_loss (ldm/util.py:437-537): per-sample masked cosine
    alignment between a delta and a (grad-scaled, signed-powered) reference
    delta;
  * calc_prompt_emb_delta_loss (ldm/util.py:2038-2091): aligns
    (subj_comp - subj_single) with (cls_comp - cls_single) in prompt space —
    the compositionality regularizer (weight 2e-4, v1-finetune-ada.yaml:40);
  * calc_recon_loss (ddpm.py:3571-3596): img/fg-mask weighted MSE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface.gradient import grad_scale


def ortho_subtract(a: jax.Array, b: jax.Array, on_last_n_dims: int = 1) -> jax.Array:
    """a - b * (<a,b>/<b,b>) over the last n dims (broadcasting allowed)."""
    if on_last_n_dims > 1:
        a, b = jnp.broadcast_arrays(a, b)
        orig_shape = a.shape
        a2 = a.reshape(*a.shape[:-on_last_n_dims], -1)
        b2 = b.reshape(*b.shape[:-on_last_n_dims], -1)
    else:
        a2, b2 = a, b
    dot_ab = jnp.sum(a2 * b2, axis=-1)
    dot_bb = jnp.sum(b2 * b2, axis=-1)
    w = dot_ab / (dot_bb + 1e-6)
    res = a2 - b2 * w[..., None]
    if on_last_n_dims > 1:
        res = res.reshape(orig_shape)
    return res


def demean(x: jax.Array, axis=-1) -> jax.Array:
    return x - jnp.mean(x, axis=axis, keepdims=True)


def _safe_norm(x, axis=-1):
    """L2 norm whose gradient is 0 (not NaN) at the zero vector. Needed
    because masked-out delta rows are exactly zero here (the reference
    boolean-indexes them away; we weight them to zero instead, and
    NaN * 0 = NaN in the backward pass)."""
    sq = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, 1e-24))


def _cosine_embedding_loss(a, b, label: int = 1):
    """F.cosine_embedding_loss(reduction='none') with margin 0."""
    cos = jnp.sum(a * b, axis=-1) / (_safe_norm(a) * _safe_norm(b) + 1e-12)
    if label == 1:
        return 1.0 - cos
    return jnp.maximum(cos, 0.0)


def calc_ref_cosine_loss(delta: jax.Array, ref_delta: jax.Array, *,
                         emb_mask: jax.Array | None = None,
                         batch_mask: jax.Array | None = None,
                         exponent: float = 2.0, do_demean_first: bool = False,
                         first_n_dims_to_flatten: int = 3,
                         ref_grad_scale: float = 0.0,
                         aim_to_align: bool = True,
                         margin: float = 0.0) -> jax.Array:
    """Masked cosine alignment loss (ldm/util.py:437-537).

    delta/ref_delta: [B, ..., D]; emb_mask broadcastable to the flattened
    leading dims (weights; zeros drop embeddings); batch_mask: [B] 0/1.

    JAX note: the reference boolean-indexes out masked rows; here the mask
    weights the per-row losses instead (identical value since dropped rows
    had weight zero).
    """
    b = delta.shape[0]
    lead = delta.shape[:first_n_dims_to_flatten]
    d = delta.reshape(b, -1, delta.shape[-1])
    rd = jnp.broadcast_to(ref_delta, delta.shape).reshape(b, -1, delta.shape[-1])

    if do_demean_first:
        d = demean(d)
        rd = demean(rd)
    rd = grad_scale(rd, ref_grad_scale)
    rd_pow = rd * jnp.abs(rd) ** (exponent - 1)

    losses = _cosine_embedding_loss(d, rd_pow, 1 if aim_to_align else -1)  # [B, N]

    if emb_mask is not None:
        m = jnp.broadcast_to(emb_mask, lead + (1,)).reshape(b, -1)
        per = jnp.sum(losses * m, axis=-1) / (jnp.sum(m, axis=-1) + 1e-8)
    else:
        per = jnp.mean(losses, axis=-1)
    if margin > 0:
        per = jnp.maximum(per - margin, 0.0)
    if batch_mask is None:
        return jnp.mean(per)
    batch_mask = batch_mask.astype(per.dtype)
    return jnp.sum(per * batch_mask) / jnp.maximum(jnp.sum(batch_mask), 1e-8)


def calc_prompt_emb_delta_loss(static_embeddings: jax.Array,
                               prompt_emb_mask: jax.Array | None,
                               cls_delta_grad_scale: float = 0.05) -> jax.Array:
    """static_embeddings: [4B', L, 77, 768] stacked as (subj_single,
    subj_comp, cls_single, cls_comp); prompt_emb_mask: [4B', 77, 1]."""
    ss, sc, cs, cc = jnp.split(static_embeddings, 4, axis=0)

    weighted = None
    if prompt_emb_mask is not None:
        mask = prompt_emb_mask.at[:, 0].set(0)  # exclude BOS
        m_ss, m_sc, _, _ = jnp.split(mask, 4, axis=0)
        agg = m_ss + m_sc
        weighted = (agg ** 2 / 4.0)[:, None]  # [B', 1, 77, 1]

    subj_delta = ortho_subtract(sc, ss)
    cls_delta = ortho_subtract(cc, cs)
    return calc_ref_cosine_loss(subj_delta, cls_delta, emb_mask=weighted,
                                do_demean_first=True, first_n_dims_to_flatten=3,
                                ref_grad_scale=cls_delta_grad_scale,
                                aim_to_align=True)


def calc_recon_loss(model_output: jax.Array, target: jax.Array,
                    img_mask: jax.Array | None, fg_mask: jax.Array | None,
                    fg_pixel_weight: float = 1.0,
                    bg_pixel_weight: float = 1.0) -> jax.Array:
    """img/fg-weighted MSE over NHWC latents (ddpm.py:3571-3596).
    Masks: [B, H, W, 1]."""
    if img_mask is None:
        img_mask = jnp.ones_like(model_output[..., :1])
    if fg_mask is None:
        fg_mask = jnp.ones_like(model_output[..., :1])
    mo = model_output.astype(jnp.float32) * img_mask
    tg = target.astype(jnp.float32) * img_mask
    se = (mo - tg) ** 2
    wfg = fg_mask * img_mask * fg_pixel_weight
    wbg = (1.0 - fg_mask) * img_mask * bg_pixel_weight
    wfg = jnp.broadcast_to(wfg, se.shape)
    wbg = jnp.broadcast_to(wbg, se.shape)
    return (jnp.sum(se * wfg) + jnp.sum(se * wbg)) / (jnp.sum(wfg) + jnp.sum(wbg) + 1e-6)
