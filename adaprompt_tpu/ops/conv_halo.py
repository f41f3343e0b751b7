"""Pallas halo-tiled implicit-GEMM 3x3 convolution, with an optional fused
GroupNorm-SiLU producer.

Status (v5e, B=8 bf16, tools/tune_fused_conv.py): isolated, the fused
kernel beats XLA's GN-SiLU + conv on three SD-UNet shapes (up to 1.19x,
_FUSED_TABLE below). In the FULL UNet graph, however, enabling it is
net-neutral to net-negative: XLA fuses the GroupNorm statistics with the
surrounding elementwise ops (skip-add, time-emb add), and cutting the graph
at a custom-call boundary loses more than the kernel gains. Hence
UNetConfig.fused_conv defaults to False; the kernel is kept as opt-in
infrastructure and as the template for future Pallas conv work.

Design notes:
  * grid (B, H/TH [, O/OT for wide layers]); each program DMAs a row-tile
    with a 1-row halo from HBM into VMEM (overlapping windows are not
    expressible as BlockSpecs);
  * channels padded to 128 multiples (Mosaic DMA lane alignment);
  * the 3x3 taps become 9 MXU matmuls whose input slices are taken from the
    FLATTENED (W*C) row layout — dx offsets are lane-contiguous, avoiding
    per-tap relayouts (the naive [dy:dy+TH, dx:dx+W] slicing costs ~45%);
  * GroupNorm is applied inside the kernel as a premultiplied per-(batch,
    channel) affine (a = gamma*rsqrt(var+eps), b = beta - mean*a) followed
    by SiLU in fp32 (Mosaic rejects bf16 logistic);
  * fp32 accumulation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


# (h, cin, cout) -> (tile_h, out_tile): configs measured FASTER than XLA's
# unfused GN-SiLU + conv on v5e (tools/tune_fused_conv.py, B=8 bf16). Only
# these shapes use the fused kernel in the UNet — for the wider SD layers
# XLA's fused pipeline already wins (our group_norm keeps the normalization
# in bf16), e.g. (16,640,1280) runs 1.66ms XLA vs 2.37ms fused.
#   (64,320,320): 2.33ms vs 2.79ms XLA (1.19x)
#   (32,320,640): 1.82ms vs 2.15ms XLA (1.18x)
#   (32,960,640): 2.14ms vs 2.17ms XLA (1.01x)
_FUSED_TABLE: dict = {
    (64, 320, 320): (4, 384),
    (32, 320, 640): (16, 640),
    (32, 960, 640): (8, 640),
}


def conv3x3_halo(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                 tile_h: int = 16) -> jax.Array:
    """3x3 stride-1 SAME conv, NHWC/HWIO, bf16 in / bf16 out, fp32 accum."""
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    cp, op = _round_up(c, 128), _round_up(o, 128)
    wpad = _round_up(w + 2, 16)
    th = tile_h
    assert h % th == 0

    def kern(x_hbm, w_ref, b_ref, o_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)

        def body(xtile, sem):
            cpy = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(ti * th, th + 2)],
                                        xtile, sem)
            cpy.start()
            cpy.wait()
            xf = xtile[:].reshape(th + 2, wpad * cp)
            acc = jnp.zeros((th * w, op), jnp.float32)
            for dy in range(3):
                row = xf[dy:dy + th]
                for dx in range(3):
                    sl = row[:, dx * cp:(dx + w) * cp].reshape(th * w, cp)
                    acc += jnp.dot(sl, w_ref[dy * 3 + dx],
                                   preferred_element_type=jnp.float32)
            acc += b_ref[:].astype(jnp.float32)
            o_ref[:] = acc.reshape(th, w, op).astype(o_ref.dtype)

        pl.run_scoped(body, pltpu.VMEM((th + 2, wpad, cp), x_hbm.dtype),
                      pltpu.SemaphoreType.DMA)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - w - 1), (0, cp - c)))
    wp = jnp.pad(kernel.reshape(9, c, o), ((0, 0), (0, cp - c), (0, op - o)))
    bp = jnp.pad(bias, (0, op - o))
    out = pl.pallas_call(
        kern, grid=(b, h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((9, cp, op), lambda bi, ti: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((op,), lambda bi, ti: (0,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, th, w, op), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, op), x.dtype),
    )(xp, wp, bp)
    return out[..., :o]


def conv3x3_im2col(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                   tile_h: int = 8, out_tile: int = 512,
                   vmem_limit_mb: int = 100) -> jax.Array:
    """3x3 stride-1 SAME conv as a true implicit GEMM: the 9 taps are
    assembled into a [tile_h*W, 9*C] patch tile IN VMEM (never touching
    HBM, unlike a materialized im2col) and contracted in ONE MXU matmul.

    Rationale (docs/PERF.md conv study): the im2col-shaped matmul
    [M, 9C] @ [9C, O] measures ~46 TF/s where XLA's conv runs ~36 at the
    64x64x320 ResBlock shape — the deep contraction amortizes the MXU
    pipeline and avoids the 9 fp32 VPU accumulation adds of the 9-dot form
    (conv3x3_halo). HBM traffic is identical to the halo kernel: one read
    of x, one write of y; the 9x patch duplication lives only in VMEM.

    vmem_limit_mb raises Mosaic's scoped-VMEM budget past the 16MB compiler
    default (v5e has 128MB physical VMEM), allowing row tiles big enough
    for MXU-efficient [tile_h*W, 9C] matmuls.
    """
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    cp, op = _round_up(c, 128), _round_up(o, 128)
    wpad = _round_up(w + 2, 16)
    th = min(tile_h, h)
    while th > 1 and h % th:
        th //= 2
    # patches tile (th*w, 9cp) bf16 + the (th+2, wpad, cp) bf16 input tile
    # + the fp32 (th*w, ot) accumulator must fit the scoped-VMEM budget,
    # kept to half for Mosaic's own temporaries. The accumulator is bounded
    # with the largest ot the selection below can pick (ot <= out_tile,
    # rounded to 128). The guard is still approximate — callers sweeping
    # unusual shapes should catch Mosaic compile failures (as i2c_sweep
    # does); this kernel is off by default (closed negative, docs/PERF.md).
    budget = vmem_limit_mb * 2 ** 20 // 2
    ot_bound = min(op, max(128, (int(out_tile) // 128) * 128))

    def _tile_bytes(t):
        return (t * w * 9 * cp * 2              # bf16 patches tile
                + (t + 2) * wpad * cp * 2       # bf16 input tile
                + t * w * ot_bound * 4)         # fp32 accumulator

    while th > 1 and _tile_bytes(th) > budget:
        th //= 2
    # largest 128-multiple divisor of op that is <= out_tile and keeps the
    # weight block within a quarter of the budget
    ot = op
    for cand in sorted({d for d in range(128, op + 1, 128)
                        if op % d == 0}, reverse=True):
        if cand <= out_tile and 9 * cp * cand * 2 <= budget // 2:
            ot = cand
            break
    else:
        ot = 128 if op % 128 == 0 else op
    assert h % th == 0 and op % ot == 0

    def kern(x_hbm, w_ref, b_ref, o_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)

        def body(xtile, patches, sem):
            cpy = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(ti * th, th + 2)],
                                        xtile, sem)
            cpy.start()
            cpy.wait()
            xf = xtile[:].reshape(th + 2, wpad * cp)
            for dy in range(3):
                row = xf[dy:dy + th]
                for dx in range(3):
                    k = dy * 3 + dx
                    patches[:, k * cp:(k + 1) * cp] = (
                        row[:, dx * cp:(dx + w) * cp].reshape(th * w, cp))
            acc = jnp.dot(patches[:], w_ref[:],
                          preferred_element_type=jnp.float32)
            acc += b_ref[0].astype(jnp.float32)
            o_ref[:] = acc.reshape(th, w, ot).astype(o_ref.dtype)

        pl.run_scoped(body, pltpu.VMEM((th + 2, wpad, cp), x_hbm.dtype),
                      pltpu.VMEM((th * w, 9 * cp), x_hbm.dtype),
                      pltpu.SemaphoreType.DMA)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - w - 1), (0, cp - c)))
    wp = jnp.pad(kernel.reshape(9, c, o), ((0, 0), (0, cp - c), (0, op - o)))
    wp = wp.reshape(9 * cp, op)
    bp = jnp.pad(bias, (0, op - o))[None]
    out = pl.pallas_call(
        kern, grid=(b, h // th, op // ot),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((9 * cp, ot), lambda bi, ti, oi: (0, oi),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ot), lambda bi, ti, oi: (0, oi),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, th, w, ot),
                               lambda bi, ti, oi: (bi, ti, 0, oi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, op), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit_mb * 2 ** 20),
    )(xp, wp, bp)
    return out[..., :o]


def gn_silu_conv3x3_halo(x: jax.Array, gn_scale: jax.Array, gn_bias: jax.Array,
                         kernel: jax.Array, bias: jax.Array, *,
                         num_groups: int = 32, eps: float = 1e-5,
                         tile_h: int = 16, out_tile: int = 512) -> jax.Array:
    """conv3x3(SiLU(GroupNorm(x))) fused: stats computed in fp32 outside,
    normalize+SiLU+taps inside one kernel (one HBM read of x)."""
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    cp, op = _round_up(c, 128), _round_up(o, 128)
    wpad = _round_up(w + 2, 16)
    # (th, ot) per shape: measured on v5e (see tools/tune_fused_conv.py).
    # Mosaic's scoped-VMEM stack accounting is too conservative/opaque to
    # model, so the SD-UNet shapes are tuned empirically; unknown shapes
    # fall back to a safe heuristic.
    tuned = _FUSED_TABLE.get((h, c, o))
    if tuned is not None:
        th, ot = tuned
    else:
        # out tile: keep the weight block (9*cp*ot*2B) under ~4MB
        ot = op
        if 9 * cp * op * 2 > 4 * 2 ** 20:
            for cand in sorted({d for d in range(128, op + 1, 128)
                                if op % d == 0}, reverse=True):
                if cand <= out_tile and 9 * cp * cand * 2 <= 4 * 2 ** 20:
                    ot = cand
                    break
            else:
                ot = 128 if op % 128 == 0 else op
        # row tile: shrink for wide channels
        th = min(tile_h, h)
        while th > 1 and (cp * (th + 2) * wpad * 2 > 2 * 2 ** 20 or h % th):
            th //= 2
    assert h % th == 0 and op % ot == 0

    # premultiplied per-(batch, channel) affine
    xg = x.reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), dtype=jnp.float32)
    var = jnp.mean(jnp.square(xg.astype(jnp.float32)
                              - mean[:, None, None, :, None]), axis=(1, 2, 4))
    inv = jax.lax.rsqrt(var + eps)
    rep = c // num_groups
    a_c = jnp.repeat(inv, rep, axis=1) * gn_scale[None].astype(jnp.float32)
    b_c = gn_bias[None].astype(jnp.float32) - jnp.repeat(mean * inv, rep, axis=1) \
        * gn_scale[None].astype(jnp.float32)
    gn_ab = jnp.stack([a_c, b_c], axis=1)                    # [B, 2, C] fp32
    gn_ab = jnp.pad(gn_ab, ((0, 0), (0, 0), (0, cp - c)))

    def kern(x_hbm, gn_ref, w_ref, b_ref, o_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)

        def body(xtile, sem):
            cpy = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(ti * th, th + 2)],
                                        xtile, sem)
            cpy.start()
            cpy.wait()
            a = gn_ref[bi, 0][None, None, :]
            sh = gn_ref[bi, 1][None, None, :]
            # affine+SiLU in place, in row chunks: caps the fp32 temps at
            # ~chunk*wpad*cp*4B*3 instead of the whole tile (scoped-VMEM OOM
            # at 1280ch otherwise). SAME-pad border must stay 0, so mask off
            # rows/cols outside the image (the shift makes silu(pad) != 0).
            chunk = max(1, (2 * 2 ** 20) // (wpad * cp * 12))
            for r0 in range(0, th + 2, chunk):
                r1 = min(r0 + chunk, th + 2)
                seg = xtile[r0:r1].astype(jnp.float32) * a + sh
                val = seg * jax.nn.sigmoid(seg)
                rowid = (ti * th + r0 - 1
                         + jax.lax.broadcasted_iota(jnp.int32,
                                                    (r1 - r0, wpad, 1), 0))
                colid = jax.lax.broadcasted_iota(jnp.int32,
                                                 (r1 - r0, wpad, 1), 1)
                valid = ((rowid >= 0) & (rowid < h)
                         & (colid >= 1) & (colid <= w))
                xtile[r0:r1] = jnp.where(valid, val, 0.0).astype(xtile.dtype)
            xf = xtile[:].reshape(th + 2, wpad * cp)
            acc = jnp.zeros((th * w, ot), jnp.float32)
            for dy in range(3):
                row = xf[dy:dy + th]
                for dx in range(3):
                    sl = row[:, dx * cp:(dx + w) * cp].reshape(th * w, cp)
                    acc += jnp.dot(sl, w_ref[dy * 3 + dx],
                                   preferred_element_type=jnp.float32)
            acc += b_ref[0].astype(jnp.float32)
            o_ref[:] = acc.reshape(th, w, ot).astype(o_ref.dtype)

        pl.run_scoped(body, pltpu.VMEM((th + 2, wpad, cp), x_hbm.dtype),
                      pltpu.SemaphoreType.DMA)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - w - 1), (0, cp - c)))
    wp = jnp.pad(kernel.reshape(9, c, o), ((0, 0), (0, cp - c), (0, op - o)))
    bp = jnp.pad(bias, (0, op - o))[None]    # 2D: rank-1 blocks have stricter tiling
    n_ot = op // ot
    out = pl.pallas_call(
        kern, grid=(b, h // th, n_ot),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((b, 2, cp), lambda bi, ti, oi: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((9, cp, ot), lambda bi, ti, oi: (0, 0, oi),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ot), lambda bi, ti, oi: (0, oi),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, th, w, ot),
                               lambda bi, ti, oi: (bi, ti, 0, oi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, op), x.dtype),
    )(xp, gn_ab, wp, bp)
    return out[..., :o]


def fused_conv_eligible(x: jax.Array, cout: int,
                        num_groups: int = 32) -> bool:
    """Use the fused kernel only for shapes measured faster than XLA
    (_FUSED_TABLE) on a TPU backend with bf16 activations."""
    return (jax.default_backend() not in ("cpu",)
            and x.dtype == jnp.bfloat16
            and x.ndim == 4 and x.shape[1] == x.shape[2]
            and (x.shape[1], x.shape[3], cout) in _FUSED_TABLE
            and x.shape[3] % num_groups == 0)
