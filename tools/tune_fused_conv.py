"""On-device tuner for the fused GN-SiLU conv kernel (ops/conv_halo.py).

Sweeps (tile_h, out_tile) per SD-UNet ResBlock conv shape, times each
compiling config against XLA's unfused GN-SiLU + conv, and prints the
table to paste into conv_halo._FUSED_TABLE. Run on a real TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tune_fused_conv.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.ops import conv_halo
from adaprompt_tpu.ops.layers import group_norm

B = 8
# every (h, cin, cout) that appears in an SD1.5 UNet ResBlock at 512x512
SHAPES = [
    (64, 320, 320), (32, 320, 640), (32, 640, 640), (16, 640, 1280),
    (16, 1280, 1280), (8, 1280, 1280), (8, 2560, 1280), (16, 2560, 1280),
    (16, 1920, 1280), (32, 1920, 640), (32, 1280, 640), (32, 960, 640),
    (64, 960, 320), (64, 640, 320),
]


def _divisors(op):
    return sorted({d for d in range(128, op + 1, 128) if op % d == 0},
                  reverse=True)


def time_fn(fn, *a):
    out = fn(*a)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = np.random.default_rng(0)
    table = {}
    for (hw, cin, cout) in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, hw, hw, cin)), jnp.bfloat16)
        gs = jnp.asarray(1 + 0.1 * rng.standard_normal(cin), jnp.bfloat16)
        gb = jnp.asarray(0.1 * rng.standard_normal(cin), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.02,
                        jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.bfloat16)

        def xla(x, gs, gb, w, b):
            hid = group_norm(x, gs, gb, num_groups=32, eps=1e-5,
                             activation="silu")
            return jax.lax.conv_general_dilated(
                hid, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype) + b

        t_xla = time_fn(jax.jit(xla), x, gs, gb, w, b)
        op = (cout + 127) // 128 * 128
        best = None
        for th in (16, 8, 4):
            if hw % th:
                continue
            ots = [op] + [d for d in _divisors(op) if d != op and d >= 256]
            if op % 128 == 0 and 128 not in ots and len(ots) < 2:
                ots.append(128)
            for ot in ots:
                conv_halo._FUSED_TABLE[(hw, cin, cout)] = (th, ot)
                try:
                    t = time_fn(
                        jax.jit(lambda *a: conv_halo.gn_silu_conv3x3_halo(*a)),
                        x, gs, gb, w, b)
                except Exception:
                    continue
                if best is None or t < best[0]:
                    best = (t, th, ot)
        conv_halo._FUSED_TABLE.pop((hw, cin, cout), None)
        if best and best[0] < t_xla:
            table[(hw, cin, cout)] = (best[1], best[2])
            print(f"WIN  ({hw},{cin},{cout}): th={best[1]} ot={best[2]} "
                  f"{best[0]:.2f}ms vs xla {t_xla:.2f}ms "
                  f"({t_xla / best[0]:.2f}x)", flush=True)
        else:
            msg = f"{best[0]:.2f}ms" if best else "no config compiled"
            print(f"LOSS ({hw},{cin},{cout}): fused {msg} vs xla "
                  f"{t_xla:.2f}ms", flush=True)
    print("\n_FUSED_TABLE.update({")
    for k, v in table.items():
        print(f"    {k}: {v},")
    print("})")


if __name__ == "__main__":
    main()
