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


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
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
