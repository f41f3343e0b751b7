"""One-shot flash-attention BACKWARD timing probe (real chip).

Times grad-of-flash_attention at the UNet training self-attention shapes.
Iterations are scan-chained inside ONE jit (dq feeds the next q carry, so
no grad can be dead-code-eliminated) — un-chained per-call timing on the
axon tunnel is dispatch-latency-bound (~85 ms/call regardless of shape).

Usage: python tools/flash_bwd_probe.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sweep", action="store_true",
                    help="A/B the _BWD_BLOCK_Q/_BWD_BLOCK_K targets "
                         "(raised-VMEM block sizes) per shape")
    args = ap.parse_args()
    from adaprompt_tpu.ops import attention as attn
    from adaprompt_tpu.ops.attention import flash_attention

    print(f"devices: {jax.devices()}", file=sys.stderr)
    n = args.iters
    block_cfgs = [(256, 256)]
    if args.sweep:
        block_cfgs += [(512, 256), (256, 512), (512, 512), (1024, 512)]
    for (b, s, h, d), bias in [((4, 4096, 8, 40), False),
                               ((4, 4096, 8, 40), True),
                               ((8, 1024, 8, 80), False)]:
        key = jax.random.PRNGKey(0)
        kq, kk, kv, kg = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
        g = jax.random.normal(kg, (b, s, h, d), jnp.bfloat16)
        kb = (jnp.zeros((b, s), jnp.float32) if bias else None)
        scale = d ** -0.5

        def loss(q, k, v):
            o = flash_attention(q, k, v, kb, scale)
            return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

        grad_fn = jax.grad(loss, argnums=(0, 1, 2))

        def chained(q, k, v):
            def body(qc, _):
                dq, dk, dv = grad_fn(qc, k, v)
                # structural dependency: dq feeds the carry (value no-op)
                qc = qc + (dq * jnp.bfloat16(1e-30)).astype(qc.dtype)
                return qc, (jnp.sum(dk.astype(jnp.float32)),
                            jnp.sum(dv.astype(jnp.float32)))
            qn, sums = jax.lax.scan(body, q, None, length=n)
            return qn, sums

        for bq, bk in block_cfgs:
            attn._BWD_BLOCK_Q, attn._BWD_BLOCK_K = bq, bk
            try:
                # fresh jit per config: the block targets are read at trace
                # time, so a cached executable would ignore the patch
                f = jax.jit(lambda q, k, v: chained(q, k, v))
                out = f(q, k, v)
                np.asarray(out[0])   # compile + sync
                t0 = time.perf_counter()
                out = f(q, k, v)
                np.asarray(out[0])
                dt = (time.perf_counter() - t0) / n * 1e3
                print(f"bwd [{b},{s},{h},{d}] bias={bias} "
                      f"bq={bq} bk={bk}: {dt:.3f} ms/iter (scan x{n})")
            except Exception as e:
                print(f"bwd [{b},{s},{h},{d}] bias={bias} bq={bq} bk={bk}: "
                      f"FAIL {str(e).splitlines()[0][:90]}")
            finally:
                attn._BWD_BLOCK_Q, attn._BWD_BLOCK_K = 256, 256


if __name__ == "__main__":
    main()
