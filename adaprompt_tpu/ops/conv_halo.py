"""Experimental Pallas halo-tiled implicit-GEMM 3x3 convolution.

Status: correct and slightly faster than XLA's conv on the SD UNet's
320ch@64x64 shape (1.22 ms vs 1.27 ms at B=8 bf16 on v5e), but not yet
integrated — the intended payoff is fusing the producing GroupNorm-SiLU
into this kernel (docs/PERF.md roadmap item 2). Kept with a parity test as
the round-2 starting point.

Design notes:
  * grid (B, H/TH); each program DMAs a row-tile with a 1-row halo from HBM
    into VMEM (overlapping windows are not expressible as BlockSpecs);
  * channels padded to 128 multiples (Mosaic DMA lane alignment);
  * the 3x3 taps become 9 MXU matmuls whose input slices are taken from the
    FLATTENED (W*C) row layout — dx offsets are lane-contiguous, avoiding
    per-tap relayouts (the naive [dy:dy+TH, dx:dx+W] slicing costs ~45%);
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
