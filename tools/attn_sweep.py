"""Attention kernel tuning sweep (run on a QUIET host — dispatch timing on
the axon tunnel is host-sensitive; docs/PERF.md).

Per shape, times the flash kernel across block_q choices, the XLA path,
and the fwd+bwd pair, with scan-amortized invocations inside one jit.

Usage: python tools/attn_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def amortized(fn, args, n=20):
    """Time fn over n scan-chained applications inside one jit."""
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
        out = f(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n * 1000)
    return best


def calibrate():
    """Peak-rate calibration: chained big matmuls, no elementwise between."""
    for n in (4096, 8192):
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

        def chain(a, b):
            c = a
            for _ in range(8):
                c = jnp.dot(c, b, preferred_element_type=jnp.bfloat16)
            return c
        f = jax.jit(chain)
        sync(f(a, b))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(a, b)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 8 * 1000)
        print(f"matmul {n}^3 bf16: {best:.3f} ms ({2*n**3/best/1e9:.1f} TF/s)")


def main():
    from adaprompt_tpu.ops import attention as attn

    print("devices:", jax.devices())
    calibrate()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    shapes = [(4096, 4096, 8, 40, "L1self"),
              (4096, 77, 8, 40, "L1cross"),
              (1024, 1024, 8, 80, "L2self"),
              (1024, 77, 8, 80, "L2cross")]
    b = 8
    for sq, sk, h, d, tag in shapes:
        q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, sk, h, d), jnp.bfloat16)
        scale = d ** -0.5
        flops = 2 * 2 * b * h * sq * sk * d

        t = amortized(lambda q, k, v: attn._attention_xla(q, k, v, None, None, scale),
                      (q, k, v))
        print(f"{tag:8s} xla            {t:7.3f} ms ({flops/t/1e9:6.1f} TF/s)")

        for bq in (128, 256, 512, 1024):
            if sq % bq:
                continue
            orig = attn._pick_block

            def forced_pick(n, target, _bq=bq, _orig=orig):
                # the q-block call uses target<=512 (attention.py); only
                # override that one, leave block_k picking untouched
                if n == sq and target <= 512:
                    return min(_bq, n)
                return _orig(n, target)

            attn._pick_block = forced_pick
            try:
                t = amortized(lambda q, k, v: attn.flash_attention(
                    q, k, v, None, scale, False), (q, k, v))
                print(f"{tag:8s} flash bq={bq:<5d} {t:7.3f} ms ({flops/t/1e9:6.1f} TF/s)")
            except Exception as e:
                print(f"{tag:8s} flash bq={bq:<5d} FAILED: {str(e)[:80]}")
            finally:
                attn._pick_block = orig

        # fwd+bwd at default blocks
        g = lambda q, k, v: jax.grad(
            lambda q, k, v: jnp.sum(attn.flash_attention(q, k, v, None, scale,
                                                         False)
                                    .astype(jnp.float32)),
            argnums=0)(q, k, v)
        t = amortized(g, (q, k, v), n=8)
        print(f"{tag:8s} flash fwd+dq   {t:7.3f} ms")


if __name__ == "__main__":
    main()
