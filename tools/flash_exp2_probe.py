"""A/B probe: flash forward variants (exp vs exp2-folded vs no-max cap).

Run on a QUIET host (docs/PERF.md measurement rules). Timings amortized via
scan-chained invocations in one jit; numerics column = max|Δ| vs the XLA
einsum reference on the same inputs.

Usage: python tools/flash_exp2_probe.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.ops import attention as attn


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def amortized(fn, args, n):
    def scanned(*args):
        def body(c, _):
            o = fn(args[0] + c, *args[1:])
            return (jnp.sum(o.astype(jnp.float32)) * 1e-30).astype(args[0].dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), args[0].dtype), None, length=n)
        return c
    f = jax.jit(scanned)
    sync(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, (time.perf_counter() - t0) / n * 1000)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    print("devices:", jax.devices())

    b, sq, sk, h, d = args.batch, 4096, 4096, 8, 40
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, sk, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, sk, h, d), jnp.bfloat16)
    scale = d ** -0.5
    # numerics reference on a 2-batch slice (the full-batch einsum would
    # materialize an 8.6 GB score tensor)
    ref = np.asarray(attn._attention_xla(q[:2], k[:2], v[:2], None, None,
                                         scale), np.float32)

    def fwd(q, k, v):
        return attn.flash_attention(q, k, v, None, scale, False)

    def fwdbwd(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(
            attn.flash_attention(q, k, v, None, scale, False)
            .astype(jnp.float32)), argnums=(0, 1, 2))(q, k, v)[0]

    variants = [("exp   (r2 kernel)", False, False),
                ("exp2  (folded)   ", True, False),
                ("nomax (cap+exp2) ", True, True)]
    for name, e2, nm in variants:
        attn._EXP2, attn._NOMAX = e2, nm
        err = float(np.max(np.abs(
            np.asarray(fwd(q[:2], k[:2], v[:2]), np.float32) - ref)))
        t = amortized(fwd, (q, k, v), args.iters)
        print(f"fwd {name}: {t:7.3f} ms   maxerr={err:.2e}")
    for name, e2, nm in variants:
        attn._EXP2, attn._NOMAX = e2, nm
        t = amortized(fwdbwd, (q, k, v), max(4, args.iters // 3))
        print(f"fwd+bwd {name}: {t:7.3f} ms")
    attn._EXP2, attn._NOMAX = True, False


if __name__ == "__main__":
    main()
