"""Effective-HBM-bandwidth + attention-path probe (quiet host).

Round-2 docs recorded ~140 GB/s effective bandwidth and a ~30 TF/s mid-size
matmul plateau; tools/int8_probe.py later showed those numbers were
measurement artifacts (loop-invariant hoisting + unamortized sync overhead).
This probe re-measures, with data-dependent chains and an empty-scan
overhead baseline:

  1. HBM bandwidth: big elementwise add (read 2N + write N).
  2. Flash Pallas self-attention vs XLA einsum attention at the SD ds=1
     shape (bh=128, S=4096, d=40), forward only.

Usage: python tools/bw_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def overhead(n_chain):
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
    return best


def timed(f, args, n_chain):
    sync(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - overhead(n_chain), 1e-9) / n_chain


def bw_probe():
    for mb, dtype in ((256, jnp.bfloat16), (512, jnp.bfloat16),
                      (512, jnp.float32)):
        n = mb * 2 ** 20 // jnp.dtype(dtype).itemsize
        a = jnp.ones((n,), dtype)
        b = jnp.ones((n,), dtype) * 2
        n_chain = 64

        def chain(a, b):
            # full-sum consumption (a partial slice would let XLA compute
            # only that slice); the add fuses into the reduction, so the
            # measured traffic is the two input reads
            def body(c, _):
                o = jnp.sum((a + b + c.astype(a.dtype)).astype(jnp.float32))
                return o * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=n_chain)
            return c

        per = timed(jax.jit(chain), (a, b), n_chain)
        traffic = 2 * n * jnp.dtype(dtype).itemsize
        print(f"fused add+reduce {mb}MB {jnp.dtype(dtype).name}: "
              f"{per * 1e3:.2f} ms -> {traffic / per / 1e9:.0f} GB/s read")

        def chain_w(a, b):
            # array carry forces a materialized write each iteration:
            # traffic = read c + read b + write (3N)
            def body(c, _):
                return c * 0.999 + b, None
            c, _ = jax.lax.scan(body, a, None, length=n_chain)
            return jnp.sum(c.astype(jnp.float32))

        per = timed(jax.jit(chain_w), (a, b), n_chain)
        traffic = 3 * n * jnp.dtype(dtype).itemsize
        print(f"r/w muladd       {mb}MB {jnp.dtype(dtype).name}: "
              f"{per * 1e3:.2f} ms -> {traffic / per / 1e9:.0f} GB/s r+w")


def attn_probe():
    from adaprompt_tpu.ops.attention import flash_attention, _attention_xla
    b, s, h, d = 16, 4096, 8, 40
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    scale = d ** -0.5
    n_chain = 24
    flops = 4.0 * b * h * s * s * d  # QK + PV

    def chain(fn):
        def run(q, k, v):
            def body(c, _):
                o = fn(q + c.astype(q.dtype), k, v)
                return jnp.sum(o.astype(jnp.float32)) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=n_chain)
            return c
        return jax.jit(run)

    per = timed(chain(lambda q, k, v: flash_attention(q, k, v, None, scale)),
                (q, k, v), n_chain)
    print(f"flash pallas  (16x8, 4096, d40): {per * 1e3:.2f} ms "
          f"({flops / per / 1e12:.1f} TF/s)")
    per = timed(chain(lambda q, k, v: _attention_xla(q, k, v, None, None,
                                                     scale)),
                (q, k, v), n_chain)
    print(f"xla einsum    (16x8, 4096, d40): {per * 1e3:.2f} ms "
          f"({flops / per / 1e12:.1f} TF/s)")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    bw_probe()
    attn_probe()
