"""Attention ops.

`dot_product_attention` is the single attention primitive shared by every
tower in the framework (CLIP text/vision self-attn, UNet self/cross-attn,
SubjBasisGenerator perceiver/cross-attn, DINO, ArcFace has none).

Two execution paths with identical semantics:
  * `_attention_xla`: plain jnp einsum chain. XLA:TPU fuses the softmax into
    the matmuls well at the 77-token text lengths; also the CPU-test path.
  * `_attention_pallas`: a Pallas flash-attention kernel used for the UNet's
    big self-attention (up to 4096 image tokens at 64x64 latents) where
    materializing the [B*H, 4096, 4096] score matrix would blow HBM traffic.

The reference computes softmax((q*s)(k*s)^T)v with s = d^-0.25
(/root/reference/ldm/modules/attention.py:236-241,
 adaface/subj_basis_generator.py:201-203); we use the mathematically
identical single-scale form with float32 softmax accumulation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_FLASH_MIN_Q = 512  # below this, the XLA path is faster than kernel launch overhead


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: jax.Array | None = None,
                          scale: float | None = None,
                          use_flash: bool | None = None) -> jax.Array:
    """Multi-head attention.

    Args:
      q: [B, Sq, H, D]
      k: [B, Sk, H, D]
      v: [B, Sk, H, Dv]
      mask: optional additive mask broadcastable to [B, H, Sq, Sk]
        (use -inf/-1e9 for masked pairs), e.g. a causal mask.
      scale: defaults to D**-0.5.
      use_flash: force/forbid the Pallas kernel; default = auto (TPU and
        Sq >= 512 and no mask).

    Returns: [B, Sq, H, Dv]
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if use_flash is None:
        use_flash = (
            mask is None
            and q.shape[1] >= _FLASH_MIN_Q
            and jax.default_backend() not in ("cpu",)
        )
    if use_flash:
        return _attention_flash(q, k, v, scale)
    return _attention_xla(q, k, v, mask, scale)


def _attention_xla(q, k, v, mask, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention (no-mask path; UNet self-attention over image tokens)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_k):
    # Shapes per program: q_ref [block_q, D], k_ref [seq_k, D], v_ref [seq_k, Dv]
    # Matmuls run on bf16 inputs with fp32 accumulation (full MXU rate);
    # softmax statistics stay fp32.
    q = q_ref[:]
    block_q, d = q.shape
    dv = v_ref.shape[-1]

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v_blk.dtype), v_blk,
                                    preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, dv), jnp.float32)
    num_k_blocks = seq_k // block_k
    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _pick_block(n, target):
    b = min(n, target)
    while n % b:
        b //= 2
    return max(b, 1)


@functools.partial(jax.jit, static_argnames=("scale",))
def _attention_flash(q, k, v, scale):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dv = v.shape[-1]
    # Fold batch and heads into the grid; each program handles one q block.
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, dv)

    # single K pass when K fits VMEM comfortably (<=4096) — avoids the
    # online-softmax rescale traffic; otherwise stream 1024-blocks
    block_q = _pick_block(sq, 256 if sk >= 4096 else 512)
    block_k = _pick_block(sk, 4096)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k, seq_k=sk),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, sk, dv), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, dv), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, dv), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, sq, dv).transpose(0, 2, 1, 3)


def causal_mask(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask [1, 1, S, S] (0 on/below diagonal, -inf above).

    Matches transformers' _make_causal_mask used by the reference CLIP text
    towers (/root/reference/adaface/arc2face_models.py:214).
    """
    mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, dtype), k=1)
    return mask[None, None, :, :]
