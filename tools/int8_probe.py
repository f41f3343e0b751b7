"""int8-vs-bf16 MXU rate probe (run on a QUIET host; docs/PERF.md rules).

v5e advertises 2x int8 MXU rate (394 vs 197 TOPS). This slice's bf16
mid-size plateau is ~30 TF/s — the question this probe answers is whether
int8 actually doubles the achieved rate here, which decides whether an
opt-in int8 sampler path is worth building.

Shapes: the SD-1.5 hot matmuls (self-attn QK/PV at ds=1, FF projections)
plus square calibration points.

Usage: python tools/int8_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


_OVERHEAD = {}


def _sync_overhead(n_chain):
    """Per-call cost of the jit dispatch + scalar host fetch (axon tunnel),
    measured with an empty scan of the same length."""
    if n_chain in _OVERHEAD:
        return _OVERHEAD[n_chain]

    def empty(c0):
        def body(c, _):
            return c + 1e-30, None
        c, _ = jax.lax.scan(body, c0, None, length=n_chain)
        return c

    f = jax.jit(empty)
    sync(f(jnp.zeros((), jnp.float32)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        sync(f(jnp.zeros((), jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    _OVERHEAD[n_chain] = best
    return best


def time_matmul(m, k, n, dtype, acc, n_chain=48, batch=1):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    if dtype == jnp.int8:
        a = jax.random.randint(kx, (batch, m, k), -4, 4, jnp.int8)
        b = jax.random.randint(ky, (batch, k, n), -4, 4, jnp.int8)
    else:
        a = jax.random.normal(kx, (batch, m, k), dtype)
        b = jax.random.normal(ky, (batch, k, n), dtype)

    def chain(a, b):
        # feed the previous iteration's (tiny) result back into `a` so the
        # matmul is NOT loop-invariant (XLA would hoist it out of the scan
        # and we'd time one matmul + sync overhead)
        def body(c, _):
            ai = a + c.astype(a.dtype)
            o = jax.lax.dot_general(
                ai, b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=acc)
            # consume the WHOLE output (a partial slice lets XLA dead-code
            # eliminate most of the matmul); the reduction fuses into the
            # matmul epilogue
            s = jnp.sum(o.astype(jnp.float32)) * 1e-30
            return s, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=n_chain)
        return c

    f = jax.jit(chain)
    sync(f(a, b))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(a, b))
        best = min(best, time.perf_counter() - t0)
    per = max(best - _sync_overhead(n_chain), 1e-9) / n_chain
    flops = 2.0 * batch * m * k * n
    return per * 1e3, flops / per / 1e12


def time_op(fn, args, n_chain=48):
    """Time fn(*args) amortized in a data-dependent scan chain."""
    def chain(*args):
        def body(c, _):
            out = fn(args[0] + c.astype(args[0].dtype), *args[1:])
            return jnp.sum(out.astype(jnp.float32)) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=n_chain)
        return c
    f = jax.jit(chain)
    sync(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _sync_overhead(n_chain), 1e-9) / n_chain


def e2e_cases():
    """End-to-end op timings INCLUDING dynamic-quant overhead: the real
    decision input for the w8a8 sampler path (ops/quant.py)."""
    from adaprompt_tpu.ops.quant import int8_linear, int8_matmul_2operand
    from adaprompt_tpu.ops.layers import linear
    print("--- e2e w8a8 ops (incl. dynamic activation quant) ---")
    lin_cases = [
        ("FF proj C=320", (16 * 4096, 320), (320, 2560)),
        ("FF out  C=320", (16 * 4096, 1280), (1280, 320)),
        ("qkv     C=320", (16 * 4096, 320), (320, 320)),
        ("FF proj C=640", (16 * 1024, 640), (640, 5120)),
        ("FF out  C=640", (16 * 1024, 2560), (2560, 640)),
        ("FF proj C=1280", (16 * 256, 1280), (1280, 10240)),
        ("FF out  C=1280", (16 * 256, 5120), (5120, 1280)),
    ]
    for label, xs, ws in lin_cases:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, xs, jnp.bfloat16)
        w = jax.random.normal(kw, ws, jnp.bfloat16)
        flops = 2.0 * xs[0] * ws[0] * ws[1]
        n_chain = int(min(1024, max(48, 0.10 / (flops / 200e12))))
        t_bf = time_op(lambda a, b: linear(a, b), (x, w), n_chain)
        t_i8 = time_op(lambda a, b: int8_linear(a, b), (x, w), n_chain)
        print(f"{label:18s} bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s)  "
              f"w8a8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:6.1f} TOP/s)  "
              f"speedup {t_bf/t_i8:4.2f}x")

    # attention PV with both-operand dynamic quant (bh=32 to fit HBM)
    kp, kv = jax.random.split(jax.random.PRNGKey(1))
    p = jax.nn.softmax(
        jax.random.normal(kp, (32, 4096, 4096), jnp.bfloat16) * 2.0,
        axis=-1)
    v = jax.random.normal(kv, (32, 4096, 40), jnp.bfloat16)
    flops = 2.0 * 32 * 4096 * 4096 * 40
    t_bf = time_op(lambda a, b: jnp.einsum(
        "bqk,bkd->bqd", a, b, preferred_element_type=jnp.float32), (p, v), 24)
    t_i8 = time_op(lambda a, b: int8_matmul_2operand(a, b), (p, v), 24)
    print(f"{'attn PV dyn-quant':18s} bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s)  "
          f"w8a8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:6.1f} TOP/s)  "
          f"speedup {t_bf/t_i8:4.2f}x")

    # conv3x3 at SD shapes: does XLA:TPU run int8 convs at MXU int8 rate?
    print("--- conv3x3 (NHWC/HWIO) ---")
    for label, b, hw, cin, cout in [("conv 64x64x320", 16, 64, 320, 320),
                                    ("conv 32x32x640", 16, 32, 640, 640),
                                    ("conv 16x16x1280", 16, 16, 1280, 1280)]:
        kx, kw = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(kx, (b, hw, hw, cin), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, cin, cout), jnp.bfloat16)
        conv = lambda a, k, dt: jax.lax.conv_general_dilated(
            a, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)
        flops = 2.0 * b * hw * hw * 9 * cin * cout
        n_chain = int(min(512, max(48, 0.10 / (flops / 200e12))))
        t_bf = time_op(lambda a, k: conv(a, k, jnp.float32), (x, w), n_chain)
        row = (f"{label:18s} bf16 {t_bf*1e3:7.3f} ms "
               f"({flops/t_bf/1e12:6.1f} TF/s)  ")
        try:
            xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
            wi = jnp.clip(jnp.round(w.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
            t_i8 = time_op(lambda a, k: conv(a, k, jnp.int32), (xi, wi), n_chain)
            row += (f"int8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:6.1f} TOP/s)  "
                    f"speedup {t_bf/t_i8:4.2f}x")
        except Exception as e:  # int8 conv may not lower on this backend
            row += f"int8 FAILED: {str(e)[:80]}"
        print(row, flush=True)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    if "--e2e" in sys.argv:
        e2e_cases()
        return
    cases = [
        # (label, m, k, n, batch)
        ("square 2048^3", 2048, 2048, 2048, 1),
        ("square 4096^3", 4096, 4096, 4096, 1),
        ("attn QK ds=1 (bh=128)", 4096, 40, 4096, 16),   # per-head slice x16
        ("attn PV ds=1 (bh=128)", 4096, 4096, 40, 16),
        ("FF proj C=320 (B=16)", 16 * 4096, 320, 2560, 1),
        ("FF out  C=320 (B=16)", 16 * 4096, 1280, 320, 1),
        ("qkv proj C=320 (B=16)", 16 * 4096, 320, 320, 1),
    ]
    for label, m, k, n, batch in cases:
        # size the chain so estimated compute (at ~200 TF/s optimistic)
        # is ~150 ms — far above dispatch/sync overhead jitter
        flops = 2.0 * batch * m * k * n
        n_chain = int(min(2048, max(48, 0.15 / (flops / 200e12))))
        ms_bf, tf_bf = time_matmul(m, k, n, jnp.bfloat16, jnp.float32,
                                   batch=batch, n_chain=n_chain)
        ms_i8, tf_i8 = time_matmul(m, k, n, jnp.int8, jnp.int32, batch=batch,
                                   n_chain=n_chain)
        print(f"{label:28s} bf16 {ms_bf:7.2f} ms ({tf_bf:6.1f} TF/s)   "
              f"int8 {ms_i8:7.2f} ms ({tf_i8:6.1f} TOP/s)   "
              f"speedup {ms_bf / ms_i8:4.2f}x")


if __name__ == "__main__":
    main()
