"""int8 (w8a8) quantized linear ops for the sampler fast path.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPS); tools/int8_probe.py measured 1.5-2.0x on the real SD-1.5 matmul
shapes (FF projections, qkv/out projections, attention PV). This module
provides the building blocks for an OPT-IN quantized inference path:

  * `quantize_weight`   — symmetric per-output-channel int8 weight quant.
  * `int8_linear`       — dynamic per-token activation quant + int8 matmul
                          + fused dequant epilogue (+ optional bias).

Design notes (TPU-first):
  - Weight quantization is done on-the-fly inside the jitted graph from
    the ONE bf16/f32 param tree (no checkpoint surgery, training params
    untouched). In the DDIM sampler the weights are loop-invariant, so
    XLA hoists the quantization out of the `lax.scan` — it runs once per
    generate() call, not once per step.
  - Activation quantization is dynamic symmetric per-token (per-row
    abs-max): one VPU pass over x, fused by XLA with the surrounding
    elementwise chain. Per-token scales keep the quant error independent
    of outlier tokens.
  - The dequant multiply (row_scale x col_scale) and bias-add fuse into
    the matmul epilogue; there is no extra HBM round trip.

Fidelity: this changes numerics and is OPT-IN (pipeline quant="int8");
tests/test_quant.py bounds the per-layer error and the golden-chain test
bounds the end-to-end image drift vs the bf16 path.

No reference counterpart (the CUDA repo serves fp16); this is the TPU
deployment path BASELINE.md's 4 img/s/chip target requires — the bf16
peak of the chip (197 TF/s) is below the FLOP rate that target implies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


def quantize_weight(w: jax.Array, eps: float = 1e-8):
    """Symmetric per-output-channel quantization of a [K, N] weight.

    Returns (w_q int8 [K, N], scale f32 [N]) with w ~= w_q * scale.
    """
    w32 = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=0) / INT8_MAX + eps        # [N]
    w_q = jnp.clip(jnp.round(w32 / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return w_q, scale


def quantize_acts(x: jax.Array, eps: float = 1e-8):
    """Dynamic symmetric per-row (per-token) quantization of [..., M, K].

    Returns (x_q int8, scale f32 [..., M, 1]) with x ~= x_q * scale.
    """
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / INT8_MAX + eps
    x_q = jnp.clip(jnp.round(x32 / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return x_q, scale


def int8_linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                out_dtype=None) -> jax.Array:
    """y = x @ w (+ b) computed as int8 x int8 -> int32 on the MXU.

    x: [..., M, K] bf16/f32; w: [K, N] bf16/f32 (quantized on the fly —
    loop-invariant in samplers, hoisted by XLA). Returns [..., M, N] in
    `out_dtype` (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    w_q, w_scale = quantize_weight(w)
    x_q, x_scale = quantize_acts(x)
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * x_scale * w_scale                 # epilogue
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_matmul_2operand(a: jax.Array, b: jax.Array,
                         out_dtype=None) -> jax.Array:
    """Batched a @ b with BOTH operands dynamically quantized.

    a: [..., M, K], b: [..., K, N] sharing leading batch dims. Used for
    the attention PV product (P rows are probabilities in [0,1]; V is
    quantized per-row-of-K which is per-channel of the output).
    """
    out_dtype = out_dtype or a.dtype
    a_q, a_scale = quantize_acts(a)                               # [..., M, 1]
    b32 = b.astype(jnp.float32)
    b_scale = jnp.max(jnp.abs(b32), axis=-2, keepdims=True) / INT8_MAX + 1e-8
    b_q = jnp.clip(jnp.round(b32 / b_scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    nbatch = a.ndim - 2
    dnums = (((a.ndim - 1,), (nbatch,)),
             (tuple(range(nbatch)), tuple(range(nbatch))))
    y = jax.lax.dot_general(a_q, b_q, dimension_numbers=dnums,
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * a_scale * b_scale
    return y.astype(out_dtype)
