"""Decompose flash-attention backward time: fwd, dq pass, dkv pass, delta.

Each part is scan-chained inside one jit with a structural carry dependency
(see flash_bwd_probe.py). Usage: python tools/flash_bwd_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, q, n=20):
    """Time fn(q)->tensor, scan-chained via a tiny carry feedback."""
    @jax.jit
    def chained(q):
        def body(qc, _):
            o = fn(qc)
            return qc + (o[..., :1, :1, :1] * jnp.bfloat16(1e-30)
                         ).astype(qc.dtype) * 0 + qc * 0 + qc, jnp.sum(
                o.astype(jnp.float32))
        return jax.lax.scan(body, q, None, length=n)

    out = chained(q)
    np.asarray(out[1])
    t0 = time.perf_counter()
    out = chained(q)
    np.asarray(out[1])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from adaprompt_tpu.ops import attention as A

    print(f"devices: {jax.devices()}", file=sys.stderr)
    b, s, h, d = 4, 4096, 8, 40
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    g = jax.random.normal(kg, (b, s, h, d), jnp.bfloat16)
    scale = d ** -0.5

    out, lse = jax.jit(
        lambda q, k, v: A._flash_fwd_impl(q, k, v, None, scale))(q, k, v)
    np.asarray(out)

    t = chain_time(lambda qc: A._flash_fwd_impl(qc, k, v, None, scale)[0], q)
    print(f"fwd only:        {t:7.3f} ms")

    t = chain_time(
        lambda qc: A._flash_bwd_impl(qc, k, v, None, out, lse, g, scale)[0], q)
    print(f"full bwd (dq+dkv+delta): {t:7.3f} ms")

    # dq pallas pass only: reuse _flash_bwd_impl internals via monkey slices
    qf, kf, vf = A._fold_heads(q), A._fold_heads(k), A._fold_heads(v)
    dof, of = A._fold_heads(g), A._fold_heads(out)
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)

    import functools
    from jax.experimental import pallas as pl

    def dq_only(qf):
        sk = kf.shape[1]
        block_q = A._pick_block(s, 256)
        block_k_stream = A._pick_block(sk, 2048)
        bias_full = pl.BlockSpec((None, 1, 1), lambda i, j: (0, 0, 0))
        return pl.pallas_call(
            functools.partial(A._dq_kernel, scale=scale,
                              block_k=block_k_stream, seq_k=sk,
                              has_bias=False),
            grid=(b * h, s // block_q),
            in_specs=[
                pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((None, sk, d), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((None, sk, d), lambda i, j: (i, 0, 0)),
                bias_full,
                pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((None, block_q, 1), lambda i, j: (i, j, 0)),
                pl.BlockSpec((None, block_q, 1), lambda i, j: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        )(qf, kf, vf, jnp.zeros((1, 1, 1), jnp.float32), dof, lse, delta)

    t = chain_time(dq_only, qf)
    print(f"dq pass only:    {t:7.3f} ms")

    def dkv_only(qf):
        sk = kf.shape[1]
        block_k = A._pick_block(sk, 256)
        block_q_stream = A._pick_block(s, 2048)
        bias_blk = pl.BlockSpec((None, 1, 1), lambda i, j: (0, 0, 0))
        dk, dvv = pl.pallas_call(
            functools.partial(A._dkv_kernel, scale=scale,
                              block_q=block_q_stream, seq_q=s,
                              has_bias=False),
            grid=(b * h, sk // block_k),
            in_specs=[
                pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
                bias_blk,
                pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((None, s, 1), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((None, s, 1), lambda i, j: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
                jax.ShapeDtypeStruct((b * h, sk, d), v.dtype),
            ],
        )(qf, kf, vf, jnp.zeros((1, 1, 1), jnp.float32), dof, lse, delta)
        return dk

    t = chain_time(dkv_only, qf)
    print(f"dkv pass only:   {t:7.3f} ms")


if __name__ == "__main__":
    main()
