"""Attention ops.

`dot_product_attention` is the single attention primitive shared by every
tower in the framework (CLIP text/vision self-attn, UNet self/cross-attn,
SubjBasisGenerator perceiver/cross-attn, DINO, ArcFace has none).

Two execution paths with identical semantics:
  * `_attention_xla`: plain jnp einsum chain. XLA:TPU fuses the softmax into
    the matmuls well at the 77-token text lengths; also the CPU-test path.
  * `flash_attention`: a Pallas flash-attention kernel used for the UNet's
    big self-attention (up to 4096 image tokens at 64x64 latents) where
    materializing the [B*H, 4096, 4096] score matrix would blow HBM traffic.
    Differentiable: a custom_vjp with Pallas backward kernels (dQ pass +
    dK/dV pass over saved logsumexp), so every train step can run the flash
    path at 512px production resolution.

Masking:
  * `mask`: arbitrary additive mask broadcastable to [B, H, Sq, Sk] —
    XLA path only (causal text masks are 77 tokens, never hot).
  * `key_bias`: additive per-key bias [B, Sk] (the UNet img_mask semantics,
    /root/reference/ldm/modules/attention.py:223-232 where the fg mask
    drops padded border keys) — supported by BOTH paths, so masked
    self-attention still runs the flash kernel during training.

The reference computes softmax((q*s)(k*s)^T)v with s = d^-0.25
(/root/reference/ldm/modules/attention.py:236-241,
 adaface/subj_basis_generator.py:201-203); we use the mathematically
identical single-scale form with float32 softmax accumulation.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FLASH_MIN_Q = 512  # below this, the XLA path is faster than kernel launch overhead
# flash also needs a long KEY sequence to pay: at Sk=77 (training-path
# cross-attention; the sampler uses the fused kernel instead) the flash
# kernel measured 1.6x SLOWER than the XLA einsum chain (2.04 vs 1.31 ms at
# [8,4096,8,40]x77, tools/attn_sweep.py round 3) — the [Sq, 77] score tile
# wastes most of its 128-lane padding while XLA fuses the whole chain.
_FLASH_MIN_K = 256
NEG_BIG = -1e9      # masked-key bias; finite so exp arithmetic stays NaN-free

# A/B knob: ADAPROMPT_NO_FLASH=1 forces the XLA einsum path wherever the
# auto policy would pick the Pallas flash kernel (explicit use_flash=True
# still honored). Read at import, like models.unet._ABLATE.
_NO_FLASH = bool(os.environ.get("ADAPROMPT_NO_FLASH"))

_LOG2E = 1.4426950408889634

# Mosaic's default scoped-VMEM budget is 16MB — a compiler default, not a
# hardware cap (v5e has 128MB physical VMEM). The flash kernels keep K/V
# resident across q blocks plus a [block_q, seq_k] fp32 score tile, so
# block_q > 256 at seq 4096 needs the raised budget. The 64MB default here
# is tuned for v5e; on a smaller-VMEM TPU generation where the raised
# budget fails to compile, lower it via ADAPROMPT_FLASH_VMEM_MB (e.g. 16)
# — block sizes scale down with it below.
_VMEM_MB = int(os.environ.get("ADAPROMPT_FLASH_VMEM_MB", "64"))
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_MB * 2 ** 20)
# backward grid block targets (tools/flash_bwd_probe.py --sweep A/Bs these
# under the raised VMEM budget)
_BWD_BLOCK_Q = 256
_BWD_BLOCK_K = 256
# exp2 folding (A/B knob, measured NEUTRAL-to-NEGATIVE on v5e — see
# docs/PERF.md round 3): fold log2(e) into the pre-scaled q tile (and
# bias/lse), so the softmax exponential lowers to a raw exp2 instead of
# exp == exp2(x * log2e). EXACT: p = 2^((s-m)*log2e) == e^(s-m) up to fp32
# rounding; lse converts back with one [block_q, 1] multiply. Measured:
# fwd -0.1% (noise), fwd+bwd +4% SLOWER — Mosaic evidently already folds
# exp's internal multiply, and the extra lse/bias prescale passes lose.
# Kept env-gated for other toolchain versions; default off.
_EXP2 = bool(os.environ.get("ADAPROMPT_FLASH_EXP2"))
# Interleaved two-chain forward (round-5 A/B knob, measured +2% at best —
# docs/PERF.md lane study; default OFF): the single-K-pass kernel is a
# strict MXU -> VPU -> MXU serial chain (s = qK^T, then max/exp over the
# whole [block_q, seq_k] tile, then PV). _fwd_kernel_ilv splits K into
# interleaved blocks processed by TWO independent online-softmax chains,
# emitting chain B's score matmul before chain A's VPU update so the
# scheduler can overlap them; the chains merge exactly at the end
# (jointly-renormalized accumulator sum — same math as one online-softmax
# stream). Measured [8,4096,8,40]: 5.344 -> 5.229 ms at bq=1024,bk=2048;
# Mosaic evidently already achieves most of the available overlap.
# ADAPROMPT_FLASH_ILV="bq:bk" (or "1" for 512:sk/4); read at trace time so
# probes can A/B by patching _ILV.
_ILV = os.environ.get("ADAPROMPT_FLASH_ILV", "")
# Max-pass elimination (A/B knob, measured NET-NEGATIVE on v5e): replace
# the per-row score max with a Cauchy-Schwarz cap |q̂_i| * max_k |k_k| (+1
# margin) computed outside the kernel. The in-VMEM max reduction it removes
# turns out to be cheap relative to the exp pass, while the XLA-side
# prescale/norm passes over Q/K add ~1.2 ms at the bench shape: 8.2 -> 9.5
# ms (tools/flash_exp2_probe.py). Numerics stay correct (exp(s-cap) <= e^-1
# never overflows; an all-underflow row — true max > ~87 below the cap —
# yields guarded zeros, not NaN; the emitted lse stays exact so the
# backward is unaffected). Kept for the record; default off.
_NOMAX = bool(os.environ.get("ADAPROMPT_FLASH_NOMAX"))


def pallas_ok() -> bool:
    """True when compiled Pallas kernels can be used. False on the CPU
    backend and when ADAPROMPT_DISABLE_PALLAS is set — the multichip dryrun
    runs CPU computations while a TPU plugin is still the default backend,
    so the backend check alone is not sufficient there."""
    import os
    if os.environ.get("ADAPROMPT_DISABLE_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: jax.Array | None = None,
                          key_bias: jax.Array | None = None,
                          scale: float | None = None,
                          use_flash: bool | None = None) -> jax.Array:
    """Multi-head attention.

    Args:
      q: [B, Sq, H, D]
      k: [B, Sk, H, D]
      v: [B, Sk, H, Dv]
      mask: optional additive mask broadcastable to [B, H, Sq, Sk]
        (use -1e9 for masked pairs), e.g. a causal mask. XLA path only.
      key_bias: optional additive per-key bias [B, Sk] (img_mask semantics);
        works on both paths.
      scale: defaults to D**-0.5.
      use_flash: force/forbid the Pallas kernel; default = auto (TPU and
        Sq >= 512 and no full mask).

    Returns: [B, Sq, H, Dv]
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if use_flash is None:
        use_flash = (not _NO_FLASH and mask is None
                     and q.shape[1] >= _FLASH_MIN_Q
                     and k.shape[1] >= _FLASH_MIN_K and pallas_ok())
    if use_flash:
        if mask is not None:
            raise ValueError("use_flash=True cannot honor a full additive "
                             "mask; pass key_bias instead or use the XLA path")
        return flash_attention(q, k, v, key_bias, scale)
    return _attention_xla(q, k, v, mask, key_bias, scale)


def _attention_xla(q, k, v, mask, key_bias, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    if key_bias is not None:
        logits = logits + key_bias.astype(logits.dtype)[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention (key-bias path; UNet self-attention over image
# tokens). Forward emits the logsumexp rows; backward is two Pallas kernels
# (dQ gridded over q blocks, dK/dV gridded over k blocks) in the standard
# FlashAttention-2 recomputation scheme.
# ---------------------------------------------------------------------------

def _pick_block(n, target):
    b = min(n, target)
    while n % b:
        b //= 2
    return max(b, 1)


def _fwd_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref, *,
                scale, block_k, seq_k, has_bias, exp2):
    # Per program: q_ref [block_q, D]; k_ref [seq_k, D]; v_ref [seq_k, Dv+1]
    # (V augmented with a ones column OUTSIDE the kernel); b_ref [1, seq_k].
    #
    # VPU-bound shape: at D=40 both matmuls cap at 40/128 of the MXU rate,
    # so the fp32 softmax passes over the [block_q, seq_k] scores dominate.
    # Passes removed: the sm scale is folded into the small q tile (instead
    # of a full-width multiply of the scores); the row sum l rides the PV
    # matmul as V's ones column — the D=40..41 output pads to 128 lanes
    # anyway, so the MXU computes l for free and the explicit jnp.sum
    # reduction disappears (measured 1.36x, PERF.md); and with exp2, log2(e)
    # is folded into the same q tile so the exponential is a raw exp2
    # (scores live in the log2 domain; lse converts back at the end).
    eff = scale * _LOG2E if exp2 else scale
    expf = jnp.exp2 if exp2 else jnp.exp
    q = (q_ref[:].astype(jnp.float32) * eff).astype(q_ref.dtype)
    block_q, d = q.shape
    dva = v_ref.shape[-1]                # Dv + 1 (ones column)

    def body(i, carry):
        m_prev, acc = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if has_bias:
            s = s + b_ref[0, pl.ds(i * block_k, block_k)][None, :]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = expf(s - m_new)
        alpha = expf(m_prev - m_new)
        acc = acc * alpha + jnp.dot(p.astype(v_blk.dtype), v_blk,
                                    preferred_element_type=jnp.float32)
        return m_new, acc

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    acc0 = jnp.zeros((block_q, dva), jnp.float32)
    num_k_blocks = seq_k // block_k
    if num_k_blocks == 1:
        # single K pass: skip the online-softmax rescale traffic entirely
        m, acc = body(0, (m0, acc0))
    else:
        m, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, acc0))
    l = acc[:, dva - 1:dva]              # sum_k p (the ones column)
    o_ref[:] = (acc[:, :dva - 1] / l).astype(o_ref.dtype)
    m_nat = m * (1.0 / _LOG2E) if exp2 else m    # [block_q, 1], cheap
    lse_ref[:] = m_nat + jnp.log(l)


def _fwd_kernel_ilv(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref, *,
                    scale, block_k, seq_k, has_bias, exp2):
    # Two independent online-softmax chains over interleaved K blocks.
    # Emission order per pair: score(A), score(B), update(A), update(B) —
    # score(B) carries no dependency on chain A's update, so the MXU can
    # compute it while the VPU runs chain A's max/exp; chain B's update in
    # turn overlaps chain A's PV matmul. Statically unrolled (nk is small:
    # seq 4096 / block 1024 = 4). The final merge renormalizes both
    # accumulators onto the joint max — exact, same math as folding the two
    # chains into one online-softmax stream.
    eff = scale * _LOG2E if exp2 else scale
    expf = jnp.exp2 if exp2 else jnp.exp
    q = (q_ref[:].astype(jnp.float32) * eff).astype(q_ref.dtype)
    block_q, d = q.shape
    dva = v_ref.shape[-1]                # Dv + 1 (ones column)
    nk = seq_k // block_k                # even by construction (caller)

    def score(i):
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if has_bias:
            s = s + b_ref[0, pl.ds(i * block_k, block_k)][None, :]
        return s

    def upd(s, i, m_prev, acc):
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = expf(s - m_new)
        alpha = expf(m_prev - m_new)
        acc = acc * alpha + jnp.dot(p.astype(v_blk.dtype), v_blk,
                                    preferred_element_type=jnp.float32)
        return m_new, acc

    m_a = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    acc_a = jnp.zeros((block_q, dva), jnp.float32)
    m_b, acc_b = m_a, acc_a
    for j in range(nk // 2):
        s_a = score(2 * j)
        s_b = score(2 * j + 1)
        m_a, acc_a = upd(s_a, 2 * j, m_a, acc_a)
        m_b, acc_b = upd(s_b, 2 * j + 1, m_b, acc_b)
    m = jnp.maximum(m_a, m_b)
    acc = acc_a * expf(m_a - m) + acc_b * expf(m_b - m)
    l = acc[:, dva - 1:dva]
    o_ref[:] = (acc[:, :dva - 1] / l).astype(o_ref.dtype)
    m_nat = m * (1.0 / _LOG2E) if exp2 else m
    lse_ref[:] = m_nat + jnp.log(l)


def _fwd_kernel_nomax(q_ref, k_ref, v_ref, b_ref, cap_ref, o_ref, lse_ref, *,
                      scale, block_k, seq_k, has_bias, exp2):
    # No-max variant: cap_ref [block_q, 1] is a precomputed upper bound on
    # every score in the row (Cauchy-Schwarz + margin; see _NOMAX). The only
    # full-width VPU work left is ONE exp pass over the scores.
    del scale
    expf = jnp.exp2 if exp2 else jnp.exp
    q = q_ref[:]                          # pre-scaled OUTSIDE (cap needs q̂)
    block_q, d = q.shape
    dva = v_ref.shape[-1]
    cap = cap_ref[:]

    def body(i, acc):
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if has_bias:
            s = s + b_ref[0, pl.ds(i * block_k, block_k)][None, :]
        p = expf(s - cap)
        return acc + jnp.dot(p.astype(v_blk.dtype), v_blk,
                             preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((block_q, dva), jnp.float32)
    num_k_blocks = seq_k // block_k
    if num_k_blocks == 1:
        acc = body(0, acc0)
    else:
        acc = jax.lax.fori_loop(0, num_k_blocks, body, acc0)
    # guard: a row whose true max sits below the exp underflow window sums
    # to 0 — emit zero attention for it instead of NaN
    l = jnp.maximum(acc[:, dva - 1:dva], 1e-30)
    o_ref[:] = (acc[:, :dva - 1] / l).astype(o_ref.dtype)
    cap_nat = cap * (1.0 / _LOG2E) if exp2 else cap
    lse_ref[:] = cap_nat + jnp.log(l)     # still the exact lse


def _dq_kernel(q_ref, k_ref, v_ref, b_ref, do_ref, lse_ref, dl_ref, dq_ref, *,
               scale, block_k, seq_k, has_bias, exp2):
    # Same VPU-economy tricks as _fwd_kernel: the sm scale (and log2e under
    # exp2) is folded into the small q tile (s comes out pre-scaled, in the
    # log2 domain), NT dot_general avoids materializing K^T/V^T in VMEM, and
    # the remaining scalar `* scale` moves off the wide [block_q, block_k]
    # ds tensor onto the narrow [block_q, D] accumulator (scalars commute
    # through the matmul). lse/bias arrive pre-scaled by log2e under exp2.
    eff = scale * _LOG2E if exp2 else scale
    expf = jnp.exp2 if exp2 else jnp.exp
    q = (q_ref[:].astype(jnp.float32) * eff).astype(q_ref.dtype)
    do = do_ref[:]
    lse = lse_ref[:]          # [block_q, 1]  (log2 domain under exp2)
    delta = dl_ref[:]         # [block_q, 1]
    block_q, d = q.shape

    def body(i, acc):
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if has_bias:
            s = s + b_ref[0, pl.ds(i * block_k, block_k)][None, :]
        p = expf(s - lse)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return acc + jnp.dot(ds.astype(k_blk.dtype), k_blk,
                             preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    acc = jax.lax.fori_loop(0, seq_k // block_k, body, acc0)
    dq_ref[:] = (acc * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, b_ref, do_ref, lse_ref, dl_ref,
                dk_ref, dv_ref, *, scale, block_q, seq_q, has_bias, exp2):
    eff = scale * _LOG2E if exp2 else scale
    expf = jnp.exp2 if exp2 else jnp.exp
    k_blk = k_ref[:]
    v_blk = v_ref[:]
    block_k, d = k_blk.shape
    dv_dim = v_blk.shape[-1]
    bias = b_ref[0, :][None, :] if has_bias else None

    def body(i, carry):
        # scale folded into the small q tile: s = q̂ k^T is pre-scaled (and
        # in the log2 domain under exp2, matching the pre-scaled lse/bias),
        # and dk = ds^T q̂ picks up its single factor of scale from q̂ —
        # the wide [block_q, block_k] `* scale` multiply disappears; the
        # stray log2e factor is divided off the narrow accumulator at the end
        acc_dk, acc_dv = carry
        q_i = q_ref[pl.ds(i * block_q, block_q), :]
        q_i = (q_i.astype(jnp.float32) * eff).astype(q_i.dtype)
        do_i = do_ref[pl.ds(i * block_q, block_q), :]
        lse_i = lse_ref[pl.ds(i * block_q, block_q), :]   # [bq, 1]
        dl_i = dl_ref[pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(q_i, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if bias is not None:
            s = s + bias
        p = expf(s - lse_i)
        # dv += p^T do   (contract over the q dim, no explicit transpose)
        acc_dv = acc_dv + jax.lax.dot_general(
            p.astype(do_i.dtype), do_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_i, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dl_i)
        acc_dk = acc_dk + jax.lax.dot_general(
            ds.astype(q_i.dtype), q_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_dk, acc_dv

    acc0 = (jnp.zeros((block_k, d), jnp.float32),
            jnp.zeros((block_k, dv_dim), jnp.float32))
    acc_dk, acc_dv = jax.lax.fori_loop(0, seq_q // block_q, body, acc0)
    dk_fix = (1.0 / _LOG2E) if exp2 else 1.0    # q̂ carried scale*log2e
    dk_ref[:] = (acc_dk * dk_fix).astype(dk_ref.dtype)
    dv_ref[:] = acc_dv.astype(dv_ref.dtype)


def _fold_heads(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _flash_fwd_impl(q, k, v, bias, scale, *, interpret=False, nomax=None):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dv = v.shape[-1]
    has_bias = bias is not None
    exp2 = _EXP2
    if nomax is None:
        nomax = _NOMAX
    bias_fold = _LOG2E if exp2 else 1.0
    # bias lives as [B, 1, Sk] so its block's last-two dims (1, Sk) tile
    bias = (bias.astype(jnp.float32)[:, None, :] * bias_fold if has_bias
            else jnp.zeros((1, 1, 1), jnp.float32))  # dummy, never read
    qf, kf, vf = _fold_heads(q), _fold_heads(k), _fold_heads(v)
    # ones column: the PV matmul then emits the softmax row sum l in an
    # output lane that was padding anyway (see _fwd_kernel)
    vf = jnp.concatenate([vf, jnp.ones_like(vf[..., :1])], axis=-1)

    # single K pass when K fits VMEM comfortably (<=4096) — avoids the
    # online-softmax rescale traffic; otherwise stream 1024-blocks.
    # block_q 1024 needs the raised scoped-VMEM budget (_VMEM_LIMIT) for its
    # [1024, seq_k] fp32 score tile; swept best at the UNet shapes
    # (tools/attn_sweep.py round 3: 4.86 ms at bq=256 -> 4.65 at bq=1024).
    # Under a lowered ADAPROMPT_FLASH_VMEM_MB the q-block target shrinks
    # proportionally (64MB -> 1024, 16MB -> 256 == the old defaults).
    block_q = _pick_block(sq, max(256, 1024 * _VMEM_MB // 64))
    block_k = _pick_block(sk, 4096)
    ilv = _ILV and not nomax
    if ilv:
        # interleaved two-chain kernel: needs an even number of K blocks;
        # _ILV is "1" (defaults bq=512, bk=sk/4) or "bq:bk"
        if ":" in str(_ILV):
            bq_t, bk_t = (int(x) for x in str(_ILV).split(":"))
        else:
            bq_t, bk_t = 512, max(sk // 4, 128)
        block_q = _pick_block(sq, bq_t)
        block_k = _pick_block(sk, bk_t)
        if (sk // block_k) % 2:
            block_k = _pick_block(sk, block_k // 2)
        ilv = sk // block_k >= 2

    bias_spec = (pl.BlockSpec((None, 1, sk), lambda i, j: (i // h, 0, 0))
                 if has_bias else
                 pl.BlockSpec((None, 1, 1), lambda i, j: (0, 0, 0)))
    out_specs = [
        pl.BlockSpec((None, block_q, dv), lambda i, j: (i, j, 0)),
        # lse rows live as [bh, sq, 1]: the trailing singleton keeps the
        # block's last-two dims (block_q, 1) Mosaic-tileable
        pl.BlockSpec((None, block_q, 1), lambda i, j: (i, j, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b * h, sq, dv), q.dtype),
        jax.ShapeDtypeStruct((b * h, sq, 1), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
        pl.BlockSpec((None, sk, d), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((None, sk, dv + 1), lambda i, j: (i, 0, 0)),
        bias_spec,
    ]
    if nomax:
        # q̂ pre-scaled on the XLA side so the row cap is computed from the
        # very values the kernel dots; Cauchy-Schwarz: s <= |q̂_i| max_k|k|.
        # +1 margin absorbs bf16/accumulation rounding (uniformly shrinks p;
        # the normalized output is invariant to it).
        eff = scale * (_LOG2E if exp2 else 1.0)
        qf = (qf.astype(jnp.float32) * eff).astype(qf.dtype)
        qn = jnp.linalg.norm(qf.astype(jnp.float32), axis=-1, keepdims=True)
        kn = jnp.max(jnp.linalg.norm(kf.astype(jnp.float32), axis=-1),
                     axis=-1)[:, None, None]              # [bh, 1, 1]
        cap = qn * kn + 1.0                               # [bh, sq, 1] f32
        out, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_nomax, scale=scale,
                              block_k=block_k, seq_k=sk, has_bias=has_bias,
                              exp2=exp2),
            grid=(b * h, sq // block_q),
            in_specs=in_specs + [
                pl.BlockSpec((None, block_q, 1), lambda i, j: (i, j, 0))],
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(qf, kf, vf, bias, cap)
    else:
        kern = _fwd_kernel_ilv if ilv else _fwd_kernel
        out, lse = pl.pallas_call(
            functools.partial(kern, scale=scale, block_k=block_k,
                              seq_k=sk, has_bias=has_bias, exp2=exp2),
            grid=(b * h, sq // block_q),
            in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(qf, kf, vf, bias)
    return out.reshape(b, h, sq, dv).transpose(0, 2, 1, 3), lse


def _flash_bwd_impl(q, k, v, bias, out, lse, g, scale, *, interpret=False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dv = v.shape[-1]
    has_bias = bias is not None
    exp2 = _EXP2
    # under exp2 the kernels' scores live in the log2 domain: pre-scale the
    # (tiny) lse rows and bias to match (see _fwd_kernel)
    bias_fold = _LOG2E if exp2 else 1.0
    bias_arr = (bias.astype(jnp.float32)[:, None, :] * bias_fold if has_bias
                else jnp.zeros((1, 1, 1), jnp.float32))
    lse = lse * bias_fold

    qf, kf, vf = _fold_heads(q), _fold_heads(k), _fold_heads(v)
    dof = _fold_heads(g)
    of = _fold_heads(out)
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)          # [bh, sq, 1]

    block_q = _pick_block(sq, _BWD_BLOCK_Q)
    block_k_stream = _pick_block(sk, 2048)

    bias_full = (pl.BlockSpec((None, 1, sk), lambda i, j: (i // h, 0, 0))
                 if has_bias else
                 pl.BlockSpec((None, 1, 1), lambda i, j: (0, 0, 0)))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k_stream,
                          seq_k=sk, has_bias=has_bias, exp2=exp2),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, sk, dv), lambda i, j: (i, 0, 0)),
            bias_full,
            pl.BlockSpec((None, block_q, dv), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, 1), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(qf, kf, vf, bias_arr, dof, lse, delta)

    block_k = _pick_block(sk, _BWD_BLOCK_K)
    block_q_stream = _pick_block(sq, 2048)
    bias_blk = (pl.BlockSpec((None, 1, block_k), lambda i, j: (i // h, 0, j))
                if has_bias else
                pl.BlockSpec((None, 1, 1), lambda i, j: (0, 0, 0)))
    dk, dvv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q_stream,
                          seq_q=sq, has_bias=has_bias, exp2=exp2),
        grid=(b * h, sk // block_k),
        in_specs=[
            pl.BlockSpec((None, sq, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_k, dv), lambda i, j: (i, j, 0)),
            bias_blk,
            pl.BlockSpec((None, sq, dv), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, sq, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, sq, 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_k, dv), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk, dv), v.dtype),
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(qf, kf, vf, bias_arr, dof, lse, delta)

    unfold = lambda x, s: x.reshape(b, h, s, -1).transpose(0, 2, 1, 3)
    dbias = jnp.zeros_like(bias) if has_bias else None
    return unfold(dq, sq), unfold(dk, sk), unfold(dvv, sk), dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, key_bias, scale, interpret=False):
    """Flash attention with optional additive per-key bias [B, Sk].

    q/k/v: [B, S, H, D]; returns [B, Sq, H, Dv]. Fully differentiable wrt
    q, k, v (bias gets a zero gradient — it encodes a data mask).
    `interpret=True` runs the Pallas kernels in interpreter mode (CPU tests).
    """
    out, _ = _flash_fwd_impl(q, k, v, key_bias, scale, interpret=interpret)
    return out


def _flash_vjp_fwd(q, k, v, key_bias, scale, interpret):
    out, lse = _flash_fwd_impl(q, k, v, key_bias, scale, interpret=interpret)
    return out, (q, k, v, key_bias, out, lse)


def _flash_vjp_bwd(scale, interpret, res, g):
    q, k, v, key_bias, out, lse = res
    dq, dk, dv, dbias = _flash_bwd_impl(q, k, v, key_bias, out, lse, g, scale,
                                        interpret=interpret)
    return dq, dk, dv, dbias


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused small-KV cross-attention (sampler path): q-projection + scores +
# softmax + PV + out-projection in ONE kernel. The text context K/V are
# precomputed per prompt (unet.precompute_cross_kv) and tiny (77 tokens),
# so everything but x and the output stays in VMEM — the unfused chain
# makes ~4 extra HBM round trips of the [B, 4096, C] activations, and the
# pipeline is bandwidth-bound there (docs/PERF.md ablation: ~18% of DDIM
# time in cross-attention).
# ---------------------------------------------------------------------------

def _fused_cross_kernel(x_ref, wq_ref, k_ref, v_ref, wo_ref, bo_ref, o_ref,
                        *, scale, heads):
    x = x_ref[:]                                      # [bn, C]
    q = jnp.dot(x, wq_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    hd = q.shape[-1] // heads
    outs = []
    for h in range(heads):
        q_h = q[:, h * hd:(h + 1) * hd]
        k_h = k_ref[h]                                # [S, hd]
        s = jnp.dot(q_h, k_h.T,
                    preferred_element_type=jnp.float32) * scale   # [bn, S]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(x.dtype), v_ref[h],
                            preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1).astype(x.dtype)  # [bn, C]
    out = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]
    o_ref[:] = out.astype(o_ref.dtype)


def fused_cross_attention(x, wq, k, v, wo, bo, scale, num_heads,
                          interpret=False):
    """x [B, N, C] (pre-normed); wq [C, C]; k/v [B, S, H, hd] (precomputed);
    wo [C, C]; bo [C]. Returns [B, N, C] (attention output AFTER the out
    projection; add the residual outside). Forward-only (sampler path)."""
    b, n, c = x.shape
    s = k.shape[1]
    kt = k.transpose(0, 2, 1, 3)                       # [B, H, S, hd] (tiny)
    vt = v.transpose(0, 2, 1, 3)
    block_n = 512
    while n % block_n:
        block_n //= 2
    out = pl.pallas_call(
        functools.partial(_fused_cross_kernel, scale=scale, heads=num_heads),
        grid=(b, n // block_n),
        in_specs=[
            pl.BlockSpec((None, block_n, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((None, num_heads, s, k.shape[-1]),
                         lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((None, num_heads, s, v.shape[-1]),
                         lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((None, block_n, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(x, wq, kt, vt, wo, bo.astype(jnp.float32))
    return out


def _fused_cross_i8_kernel(x_ref, wq_ref, sq_ref, k_ref, v_ref, wo_ref,
                           so_ref, bo_ref, o_ref, *, scale, heads):
    # w8a8 variant: q-projection and out-projection run int8 x int8 on the
    # MXU; the per-head attention over the tiny 77-token context stays
    # bf16/fp32 (too small for quantization to pay, and P@V would need the
    # noisy P-quant the int8 flash kernel deliberately avoids).
    x32 = x_ref[:].astype(jnp.float32)                # [bn, C]
    xs = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0 + 1e-8
    x_q = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    q = jnp.dot(x_q, wq_ref[:], preferred_element_type=jnp.int32)
    q = (q.astype(jnp.float32) * xs * sq_ref[:]).astype(x_ref.dtype)
    hd = q.shape[-1] // heads
    outs = []
    for h in range(heads):
        q_h = q[:, h * hd:(h + 1) * hd]
        k_h = k_ref[h]                                # [S, hd]
        s = jnp.dot(q_h, k_h.T,
                    preferred_element_type=jnp.float32) * scale   # [bn, S]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(x_ref.dtype), v_ref[h],
                            preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1)                # [bn, C] f32
    os_ = jnp.max(jnp.abs(o), axis=-1, keepdims=True) / 127.0 + 1e-8
    o_q = jnp.clip(jnp.round(o / os_), -127, 127).astype(jnp.int8)
    out = jnp.dot(o_q, wo_ref[:], preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * os_ * so_ref[:] + bo_ref[:]
    o_ref[:] = out.astype(o_ref.dtype)


def fused_cross_attention_int8(x, wq, k, v, wo, bo, scale, num_heads,
                               interpret=False):
    """w8a8 fused cross-attention; same contract as fused_cross_attention
    (forward-only sampler path)."""
    from adaprompt_tpu.ops.quant import quantize_weight
    b, n, c = x.shape
    s = k.shape[1]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    wq_q, wq_s = quantize_weight(wq)
    wo_q, wo_s = quantize_weight(wo)
    block_n = 512
    while n % block_n:
        block_n //= 2
    out = pl.pallas_call(
        functools.partial(_fused_cross_i8_kernel, scale=scale,
                          heads=num_heads),
        grid=(b, n // block_n),
        in_specs=[
            pl.BlockSpec((None, block_n, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((None, num_heads, s, k.shape[-1]),
                         lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((None, num_heads, s, v.shape[-1]),
                         lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((None, block_n, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(x, wq_q, wq_s, kt, vt, wo_q, wo_s, bo.astype(jnp.float32))
    return out


def _fused_self_kernel(x_ref, wq_ref, kv_ref, wo_ref, bo_ref, b_ref,
                       o_ref, *, scale, heads, has_bias):
    x = x_ref[:]                                      # [bn, C]
    c = x.shape[-1]
    q = jnp.dot(x, wq_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    hd = c // heads
    kv = kv_ref[:]                                    # [S, 2C] resident VMEM
    outs = []
    for h in range(heads):
        q_h = q[:, h * hd:(h + 1) * hd]
        k_h = kv[:, h * hd:(h + 1) * hd]              # [S, hd]
        v_h = kv[:, c + h * hd:c + (h + 1) * hd]
        s = jnp.dot(q_h, k_h.T,
                    preferred_element_type=jnp.float32) * scale   # [bn, S]
        if has_bias:
            s = s + b_ref[0, :][None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(x.dtype), v_h,
                            preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1).astype(x.dtype)
    out = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]
    o_ref[:] = out.astype(o_ref.dtype)


def fused_self_attention(x, wq, wk, wv, wo, bo, scale, num_heads,
                         key_bias=None, interpret=False):
    """Fused self-attention block for the SAMPLER path (forward-only).

    x [B, N, C] pre-normed. K/V are projected once per (batch, layer) by a
    plain fused matmul (bandwidth-optimal in XLA), kept in the folded
    [B, H, N, hd] layout, and stay resident in VMEM across all q blocks —
    the kernel then fuses q-projection + per-head softmax(QK^T)V + the out
    projection, so the [B, N, C] activations make exactly one round trip.
    key_bias: optional additive [B, N] img-mask bias.
    """
    b, n, c = x.shape
    hd = c // num_heads
    # single fused K|V projection, kept packed [B, N, 2C]: lane-aligned in
    # VMEM (per-head [H, N, hd] layouts pad hd->128 lanes and triple VMEM)
    kv = jnp.dot(x, jnp.concatenate([wk, wv], axis=1),
                 preferred_element_type=jnp.float32).astype(x.dtype)
    has_bias = key_bias is not None
    bias = (key_bias.astype(jnp.float32)[:, None, :] if has_bias
            else jnp.zeros((1, 1, 1), jnp.float32))
    bias_spec = (pl.BlockSpec((None, 1, n), lambda i, j: (i, 0, 0))
                 if has_bias else
                 pl.BlockSpec((None, 1, 1), lambda i, j: (0, 0, 0)))
    # block_n 128 keeps the resident [N, 2C] K/V + per-head fp32 score
    # blocks inside the 16MB scoped-VMEM limit at N=4096
    block_n = 128
    while n % block_n:
        block_n //= 2
    out = pl.pallas_call(
        functools.partial(_fused_self_kernel, scale=scale, heads=num_heads,
                          has_bias=has_bias),
        grid=(b, n // block_n),
        in_specs=[
            pl.BlockSpec((None, block_n, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((None, n, 2 * c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((None, block_n, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(x, wq, kv, wo, bo.astype(jnp.float32), bias)
    return out


# ---------------------------------------------------------------------------
# int8-QK flash attention (forward-only; the ADAPROMPT_QUANT=int8 sampler
# path). SageAttention-style: K is mean-centered along the sequence (softmax
# is invariant to a per-query constant shift q . k_mean), then Q and K are
# quantized per-token to int8 so the QK^T matmul runs at the v5e's 2x int8
# MXU rate; the softmax statistics and the PV matmul stay fp32/bf16 —
# quantizing P to int8 would put the quant step (1/127) on the same order as
# diffuse attention probabilities (~1/4096) and drown the output in noise.
# No reference counterpart (the CUDA repo serves fp16); deployment-path
# speedup for BASELINE.md's 4 img/s target.
# ---------------------------------------------------------------------------

def _fwd_kernel_i8(q_ref, qs_ref, kt_ref, ks_ref, v_ref, b_ref, o_ref, *,
                   scale, block_k, seq_k, has_bias):
    # q_ref [block_q, D] int8; qs_ref [block_q, 1] f32 per-token scales;
    # kt_ref [D, seq_k] int8 (pre-transposed); ks_ref [1, seq_k] f32;
    # v_ref [seq_k, Dv] bf16; b_ref [1, seq_k] f32 additive key bias.
    q = q_ref[:]
    qs = qs_ref[:] * scale                       # fold sm scale into q scale
    block_q = q.shape[0]
    dv = v_ref.shape[-1]

    def body(i, carry):
        m_prev, l_prev, acc = carry
        kt_blk = kt_ref[:, pl.ds(i * block_k, block_k)]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s32 = jax.lax.dot_general(q, kt_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * qs         # [bq, bk] * [bq, 1]
        s = s * ks_ref[0, pl.ds(i * block_k, block_k)][None, :]
        if has_bias:
            s = s + b_ref[0, pl.ds(i * block_k, block_k)][None, :]
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
    if num_k_blocks == 1:
        m, l, acc = body(0, (m0, l0, acc0))
    else:
        m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _quant_rows(x, axis=-1):
    """Symmetric per-row int8 quantization: returns (int8 values, f32 scale
    with the reduced axis kept)."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=axis, keepdims=True) / 127.0 + 1e-8
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def flash_attention_int8(q, k, v, key_bias=None, scale=None, interpret=False):
    """Forward-only flash attention with int8 QK^T (sampler quant path).

    q/k/v: [B, S, H, D]; returns [B, Sq, H, Dv]. Numerics: K mean-centered
    over Sk (softmax-invariant), Q/K per-token symmetric int8, logits
    dequantized in fp32, softmax + PV exactly as the bf16 kernel. NOT
    differentiable — serving only.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dv = v.shape[-1]
    has_bias = key_bias is not None
    bias = (key_bias.astype(jnp.float32)[:, None, :] if has_bias
            else jnp.zeros((1, 1, 1), jnp.float32))

    k = k - jnp.mean(k, axis=1, keepdims=True)   # per (b, h) key centering
    qf, kf, vf = _fold_heads(q), _fold_heads(k), _fold_heads(v)
    q_q, q_s = _quant_rows(qf)                   # [bh, sq, d], [bh, sq, 1]
    k_q, k_s = _quant_rows(kf)
    kt = k_q.transpose(0, 2, 1)                  # [bh, d, sk] int8
    ks = k_s.transpose(0, 2, 1)                  # [bh, 1, sk]

    block_q = _pick_block(sq, 256 if sk >= 4096 else 512)
    block_k = _pick_block(sk, 4096)

    bias_spec = (pl.BlockSpec((None, 1, sk), lambda i, j: (i // h, 0, 0))
                 if has_bias else
                 pl.BlockSpec((None, 1, 1), lambda i, j: (0, 0, 0)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_i8, scale=scale, block_k=block_k,
                          seq_k=sk, has_bias=has_bias),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, block_q, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, d, sk), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, 1, sk), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, sk, dv), lambda i, j: (i, 0, 0)),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((None, block_q, dv), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, dv), q.dtype),
        interpret=interpret,
    )(q_q, q_s, kt, ks, vf, bias)
    return out.reshape(b, h, sq, dv).transpose(0, 2, 1, 3)


def causal_mask(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask [1, 1, S, S] (0 on/below diagonal, -inf above).

    Matches transformers' _make_causal_mask used by the reference CLIP text
    towers (/root/reference/adaface/arc2face_models.py:214).
    """
    mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, dtype), k=1)
    return mask[None, None, :, :]
