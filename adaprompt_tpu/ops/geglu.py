"""Fused GEGLU feed-forward kernel.

The transformer FF (proj -> split -> a * gelu(gate) -> out,
/root/reference/ldm/modules/attention.py GEGLU+FeedForward) is
HBM-bandwidth-bound when executed as separate XLA ops: the [M, 8C]
projection output and the [M, 4C] gated intermediate each make a round
trip to HBM (~3x the input traffic). This kernel tiles over rows and keeps
both intermediates in VMEM — HBM traffic drops to x-in + out (plus the two
weight matrices, resident across the grid).

End-to-end ablation on the bench pipeline attributes ~26% of DDIM-50
time to the FF stack (docs/PERF.md), almost all of it bandwidth.

GELU is exact-erf semantics via the Abramowitz-Stegun 7.1.26 rational
approximation (|err| < 1.5e-7; Mosaic has no erf primitive) computed in
fp32. Backward = recompute through the unfused XLA path (the UNet is
frozen in all training modes; only d/dx is consumed, but full cotangents
are returned for generality).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_P = 0.3275911
_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26, fp32, |err| < 1.5e-7."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _P * ax)
    poly = t * (_A[0] + t * (_A[1] + t * (_A[2] + t * (_A[3] + t * _A[4]))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(x):
    return x * 0.5 * (1.0 + _erf_approx(x * 0.7071067811865476))


def geglu_reference(x, w1, b1, w2, b2):
    """Unfused XLA path (CPU tests + backward recompute)."""
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    a, gate = jnp.split(h, 2, axis=-1)
    g = a * jax.nn.gelu(gate, approximate=False)
    return (jnp.dot(g.astype(x.dtype), w2,
                    preferred_element_type=jnp.float32) + b2).astype(x.dtype)


def _geglu_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    f = h.shape[-1] // 2
    a, gate = h[:, :f], h[:, f:]
    g = a * _gelu_exact_f32(gate)
    out = jnp.dot(g.astype(x.dtype), w2_ref[:],
                  preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = out.astype(o_ref.dtype)


def _pick_block_m(m, f2):
    # keep the fp32 [block_m, 2F] intermediate around ~5MB of VMEM
    cap = max(5_000_000 // (f2 * 4), 8)
    b = 512
    while b > cap:
        b //= 2
    while m % b:
        b //= 2
    return max(b, 8)


def fused_eligible(x, w1) -> bool:
    """Fused only when both weight matrices fit VMEM alongside the row
    block and the row count tiles. The 10MB weight cap admits the SD-1.5
    C=320 (1.2MB) and C=640 (9.8MB) layers — at C=640 _pick_block_m drops
    the row block to 128 so the fp32 intermediates stay ~2.6MB and the
    whole working set fits VMEM; measured 2.35ms vs 2.99ms XLA at the ds=2
    bench shape (docs/PERF.md round 3). C=1280 (39MB) stays on XLA."""
    c, f2 = w1.shape
    m = 1
    for s in x.shape[:-1]:
        m *= s
    weights_bytes = (c * f2 + (f2 // 2) * c) * x.dtype.itemsize
    return weights_bytes <= 10_000_000 and m % 8 == 0 and f2 % 256 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def geglu(x, w1, b1, w2, b2, interpret=False):
    """Fused GEGLU: x [.., N, C]; w1 [C, 2F]; b1 [2F]; w2 [F, C]; b2 [C].

    Returns [.., N, C]. Differentiable (backward recomputes via the XLA
    path). `interpret=True` for CPU tests.
    """
    return _geglu_impl(x, w1, b1, w2, b2, interpret)


def _geglu_impl(x, w1, b1, w2, b2, interpret):
    shape = x.shape
    c = shape[-1]
    m = 1
    for s in shape[:-1]:
        m *= s
    xf = x.reshape(m, c)
    f2 = w1.shape[-1]
    block_m = _pick_block_m(m, f2)
    out = pl.pallas_call(
        _geglu_kernel,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0)),
            pl.BlockSpec((c, f2), lambda i: (0, 0)),
            pl.BlockSpec((f2,), lambda i: (0,)),
            pl.BlockSpec((f2 // 2, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=interpret,
    )(xf, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32))
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# int8 fused GEGLU (forward-only; ADAPROMPT_QUANT=int8 sampler path).
# Same VMEM-resident fusion as `geglu`, with both matmuls running as
# w8a8 int8 on the MXU (2x bf16 rate on v5e). Weights are quantized
# per-output-channel OUTSIDE the kernel (loop-invariant in samplers, so
# XLA hoists the quantization out of the DDIM scan); activations are
# quantized per-row in-kernel (VPU pass fused with the gelu chain).
# int8 weights are half the bytes, so the C=640 layers fit the VMEM cap
# that excludes them from the bf16 kernel (fused_eligible docstring).
# ---------------------------------------------------------------------------

def _geglu_i8_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                     o_ref):
    x32 = x_ref[:].astype(jnp.float32)
    xs = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0 + 1e-8
    x_q = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    h = jnp.dot(x_q, w1_ref[:], preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * xs * s1_ref[:] + b1_ref[:]
    f = h.shape[-1] // 2
    a, gate = h[:, :f], h[:, f:]
    g = a * _gelu_exact_f32(gate)
    gs = jnp.max(jnp.abs(g), axis=-1, keepdims=True) / 127.0 + 1e-8
    g_q = jnp.clip(jnp.round(g / gs), -127, 127).astype(jnp.int8)
    out = jnp.dot(g_q, w2_ref[:], preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * gs * s2_ref[:] + b2_ref[:]
    o_ref[:] = out.astype(o_ref.dtype)


def fused_int8_eligible(x, w1) -> bool:
    """int8 weights are 1 byte/elem: C=320 (1.2MB) and C=640 (4.9MB) fit;
    C=1280 (19.7MB) still does not."""
    c, f2 = w1.shape
    m = 1
    for s in x.shape[:-1]:
        m *= s
    weights_bytes = c * f2 + (f2 // 2) * c
    return weights_bytes <= 8_000_000 and m % 8 == 0 and f2 % 256 == 0


def geglu_int8(x, w1, b1, w2, b2, interpret=False):
    """Fused w8a8 GEGLU; same signature/semantics as `geglu` with int8
    matmuls (forward-only — round() has no gradient)."""
    from adaprompt_tpu.ops.quant import quantize_weight
    shape = x.shape
    c = shape[-1]
    m = 1
    for s in shape[:-1]:
        m *= s
    xf = x.reshape(m, c)
    f2 = w1.shape[-1]
    w1_q, w1_s = quantize_weight(w1)
    w2_q, w2_s = quantize_weight(w2)
    block_m = _pick_block_m(m, f2)
    out = pl.pallas_call(
        _geglu_i8_kernel,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0)),
            pl.BlockSpec((c, f2), lambda i: (0, 0)),
            pl.BlockSpec((f2,), lambda i: (0,)),
            pl.BlockSpec((f2,), lambda i: (0,)),
            pl.BlockSpec((f2 // 2, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=interpret,
    )(xf, w1_q, w1_s, b1.astype(jnp.float32),
      w2_q, w2_s, b2.astype(jnp.float32))
    return out.reshape(shape)


def _geglu_fwd(x, w1, b1, w2, b2, interpret):
    return _geglu_impl(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _geglu_bwd(interpret, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(lambda *a: geglu_reference(*a), x, w1, b1, w2, b2)
    # cotangent dtype must match geglu_reference's output (= x.dtype)
    return vjp(g.astype(x.dtype))


geglu.defvjp(_geglu_fwd, _geglu_bwd)
