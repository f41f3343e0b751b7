"""3x3 conv schedule probe (real chip): lax.conv vs shifted-matmul forms.

PERF.md round-3 measured XLA's conv_general_dilated at 49-64 TF/s on the
UNet ResBlock shapes while plain big matmuls run ~98 TF/s on the same
slice. A 3x3 same-pad conv is exactly 9 shifted [M, C] @ [C, F] matmuls
accumulated, so if XLA's conv schedule is the bottleneck (not the memory
traffic), the decomposed form should approach the matmul rate.

Forms probed per shape:
  * conv:    jax.lax.conv_general_dilated (NHWC/HWIO), the in-tree path
  * shift9:  pad once, 9 slice+reshape matmuls accumulated in fp32
  * im2col:  materialized [M, 9C] patches -> ONE [M,9C]@[9C,F] matmul

Timing: scan-chained inside one jit (output feeds the next input) so
per-call dispatch latency on the axon tunnel is amortized; consumed by a
quadratic reduction computed ON DEVICE — fetching the full output tensor
times the ~80 ms tunnel transfer, not the kernel, and a plain sum() lets
XLA algebraically shortcut matmuls (PERF.md measurement rules).

Usage: python tools/conv_probe.py [--iters 10]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_shift9(x, w):
    b, h, wd, c = x.shape
    f = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b * h * wd, f), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, di, dj, 0), (b, h, wd, c))
            acc = acc + jnp.dot(xs.reshape(b * h * wd, c), w[di, dj],
                                preferred_element_type=jnp.float32)
    return acc.reshape(b, h, wd, f).astype(x.dtype)


def conv_im2col(x, w):
    b, h, wd, c = x.shape
    f = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [jax.lax.dynamic_slice(xp, (0, di, dj, 0), (b, h, wd, c))
            for di in range(3) for dj in range(3)]
    patches = jnp.concatenate(cols, axis=-1).reshape(b * h * wd, 9 * c)
    out = jnp.dot(patches, w.reshape(9 * c, f),
                  preferred_element_type=jnp.float32)
    return out.reshape(b, h, wd, f).astype(x.dtype)


def conv_halo9(x, w):
    from adaprompt_tpu.ops import conv_halo
    return conv_halo.conv3x3_halo(x, w, jnp.zeros(w.shape[-1], x.dtype))


def conv_halo_i2c(x, w):
    from adaprompt_tpu.ops import conv_halo
    return conv_halo.conv3x3_im2col(x, w, jnp.zeros(w.shape[-1], x.dtype))


FORMS = {"conv": conv_ref, "shift9": conv_shift9, "im2col": conv_im2col,
         "halo9": conv_halo9, "halo_i2c": conv_halo_i2c}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--forms", type=str, default=",".join(FORMS),
                    help="comma list of forms to probe (conv always first)")
    args = ap.parse_args()
    n = args.iters
    sel = [f for f in args.forms.split(",") if f]
    if "conv" not in sel:
        sel = ["conv"] + sel
    forms = {k: FORMS[k] for k in FORMS if k in sel}

    shapes = [(16, 64, 64, 320, 320),
              (16, 32, 32, 640, 640),
              (16, 16, 16, 1280, 1280)]
    key = jax.random.PRNGKey(0)
    for (b, h, wd, c, f) in shapes:
        kx, kw = jax.random.split(jax.random.fold_in(key, c))
        x = jax.random.normal(kx, (b, h, wd, c), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, c, f), jnp.bfloat16) * 0.02
        gflop = 2 * b * h * wd * 9 * c * f / 1e9

        ref = np.asarray(FORMS["conv"](x, w), np.float32)
        for name, fn in forms.items():
            @jax.jit
            def chained(x, w, fn=fn):
                def body(xc, _):
                    y = fn(xc, w)
                    # structural dep: feed y back as the next input
                    return y, ()
                y, _ = jax.lax.scan(body, x, None, length=n)
                # scalar quadratic consumption: device-side reduction (a
                # full-tensor fetch times the tunnel, not the kernel)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            float(chained(x, w))  # compile + warmup
            t0 = time.perf_counter()
            float(chained(x, w))
            dt = (time.perf_counter() - t0) / n
            tfs = gflop / dt / 1e3
            if name == "conv":
                err = 0.0
            else:
                out = np.asarray(fn(x, w), np.float32)
                err = float(np.max(np.abs(out - ref)) /
                            (np.abs(ref).max() + 1e-6))
            log(f"[{b},{h}x{wd},{c}->{f}] {name:7s}: {dt*1e3:7.2f} ms "
                f"{tfs:6.1f} TF/s  maxrelerr={err:.2e}")


if __name__ == "__main__":
    main()
