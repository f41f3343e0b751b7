"""Tile sweep for ops/conv_halo.conv3x3_im2col on the real chip.

Finds (tile_h, out_tile) per SD-UNet ResBlock shape that fits Mosaic's
16MB scoped-VMEM stack and beats XLA's conv. Timing per PERF.md rules:
scan-chained in one jit, quadratic-consumed scalar fetch.

Usage: python tools/i2c_sweep.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.ops import conv_halo


def log(m):
    print(m, file=sys.stderr, flush=True)


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def time_form(fn, x, w, n):
    @jax.jit
    def chained(x, w):
        def body(xc, _):
            return fn(xc, w), ()
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    float(chained(x, w))
    t0 = time.perf_counter()
    float(chained(x, w))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--shapes", type=str, default="",
                    help="comma list of indices into the shape table")
    ap.add_argument("--ths", type=str, default="2,4,8")
    ap.add_argument("--ots", type=str, default="128,256,384,512")
    args = ap.parse_args()
    n = args.iters
    b = args.batch
    ths = [int(v) for v in args.ths.split(",")]
    ots = [int(v) for v in args.ots.split(",")]

    shapes = [(b, 64, 64, 320, 320),
              (b, 32, 32, 640, 640),
              (b, 16, 16, 1280, 1280),
              (b, 32, 32, 960, 640),   # skip-concat up-block shape
              (b, 64, 64, 640, 320)]
    if args.shapes:
        shapes = [shapes[int(i)] for i in args.shapes.split(",")]
    key = jax.random.PRNGKey(0)
    for (bb, h, wd, c, f) in shapes:
        kx, kw = jax.random.split(jax.random.fold_in(key, c * 7 + h))
        x = jax.random.normal(kx, (bb, h, wd, c), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, c, f), jnp.bfloat16) * 0.02
        gflop = 2 * bb * h * wd * 9 * c * f / 1e9

        dt = time_form(conv_ref, x, w, n)
        log(f"[{bb},{h}x{wd},{c}->{f}] conv       : {dt*1e3:7.2f} ms "
            f"{gflop/dt/1e3:6.1f} TF/s")
        ref = np.asarray(conv_ref(x, w), np.float32)

        for th in ths:
            if h % th:
                continue
            for ot in ots:
                fp = conv_halo._round_up(f, 128)
                if fp % ot:
                    continue
                fn = lambda x, w, th=th, ot=ot: conv_halo.conv3x3_im2col(
                    x, w, jnp.zeros(w.shape[-1], x.dtype),
                    tile_h=th, out_tile=ot)
                try:
                    dt = time_form(fn, x, w, n)
                except Exception as e:
                    log(f"  th={th} ot={ot}: FAIL {type(e).__name__} "
                        f"{str(e).splitlines()[0][:90]}")
                    continue
                out = np.asarray(fn(x, w), np.float32)
                err = float(np.max(np.abs(out - ref)) /
                            (np.abs(ref).max() + 1e-6))
                log(f"  th={th} ot={ot}: {dt*1e3:7.2f} ms "
                    f"{gflop/dt/1e3:6.1f} TF/s  maxrelerr={err:.2e}")


if __name__ == "__main__":
    main()
