"""Round-5 attention lane-utilization study (run on a QUIET host).

Two questions from the round-4 verdict (docs/PERF.md D=40 analysis):

1. Block-diagonal head packing: does packing 3 heads' K into 120 of the
   128 contraction lanes beat 3 separate D=40 matmuls? Cost-model claim:
   NO — with the contraction padded to 128, every packing that preserves
   per-head outputs grows another dim proportionally (3 heads block-diag:
   [bq,120]x[120,3*sk] vs 3x [bq,128pad]x[128pad,sk] — identical padded
   MAC count). Measured here to close the question empirically.

2. MXU/VPU overlap: the flash kernel's single-K-pass path serializes
   QK (MXU) -> max/exp (VPU) -> PV (MXU). The interleaved two-chain kernel
   (attention._fwd_kernel_ilv) gives the scheduler independent work to
   overlap. Sweeps (block_q, block_k) against the current default.

Timing: scan-amortized inside one jit, QUADRATIC consumption (sum(o*o)) so
XLA cannot algebraically shortcut matmuls, scalar fetch sync (PERF.md
measurement rules).

Usage: python tools/lane_probe.py [--bench-b 8] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32) ** 2))


def amortized(fn, args, n=20, reps=3):
    def scanned(*args):
        def body(c, _):
            o = fn(args[0] + c, *args[1:])
            return (jnp.sum(o.astype(jnp.float32) ** 2) * 1e-30).astype(
                args[0].dtype), None
        c, _ = jax.lax.scan(body, jnp.zeros((), args[0].dtype), None, length=n)
        return c
    f = jax.jit(scanned)
    sync(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n * 1000)
    return best


def calibrate():
    a = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.bfloat16)
    t = amortized(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16),
                  (a, b), n=8)
    print(f"calibration 4096^3 bf16: {t:.3f} ms ({2*4096**3/t/1e9:.1f} TF/s)")


def blockdiag_study(bq=4096, sk=4096, d=40, g=3):
    """3 separate [bq,d]x[d,sk] QK matmuls vs one block-diag packed
    [bq, g*d] x [g*d, g*sk]."""
    ks = jax.random.split(jax.random.PRNGKey(2), 2 * g)
    qs = [jax.random.normal(ks[i], (bq, d), jnp.bfloat16) for i in range(g)]
    kts = [jax.random.normal(ks[g + i], (d, sk), jnp.bfloat16)
           for i in range(g)]

    def separate(q0, *rest):
        qs_ = (q0,) + rest[:g - 1]
        kts_ = rest[g - 1:]
        outs = [jnp.dot(q, kt, preferred_element_type=jnp.float32)
                for q, kt in zip(qs_, kts_)]
        return jnp.stack(outs)

    t_sep = amortized(separate, tuple(qs) + tuple(kts), n=10)

    q_pack = jnp.concatenate(qs, axis=1)                     # [bq, g*d]
    kt_bd = jnp.zeros((g * d, g * sk), jnp.bfloat16)
    for i in range(g):
        kt_bd = kt_bd.at[i * d:(i + 1) * d, i * sk:(i + 1) * sk].set(kts[i])

    def packed(q_pack, kt_bd):
        return jnp.dot(q_pack, kt_bd, preferred_element_type=jnp.float32)

    t_pack = amortized(packed, (q_pack, kt_bd), n=10)
    useful = 2 * g * bq * d * sk
    print(f"blockdiag QK g={g} d={d}: separate {t_sep:.3f} ms "
          f"({useful/t_sep/1e9:.1f} TF/s useful) vs packed {t_pack:.3f} ms "
          f"({useful/t_pack/1e9:.1f} TF/s useful)")


def flash_sweep(b, iters):
    from adaprompt_tpu.ops import attention as attn
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    for sq, sk, h, d, tag in [(4096, 4096, 8, 40, "L1self"),
                              (1024, 1024, 8, 80, "L2self")]:
        q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, sk, h, d), jnp.bfloat16)
        scale = d ** -0.5
        flops = 2 * 2 * b * h * sq * sk * d

        # parity gate: ilv kernel must match the XLA path before timing
        ref = attn._attention_xla(q, k, v, None, None, scale)
        attn._ILV = "512:1024"
        got = attn.flash_attention(q, k, v, None, scale, False)
        attn._ILV = ""
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        assert err < 2e-2, f"ilv parity fail {tag}: {err}"
        print(f"{tag}: ilv parity max|err| = {err:.2e}")

        variants = [("default (bq=1024, 1 K pass)", "")]
        for bq in (256, 512, 1024):
            for bk in (512, 1024, 2048):
                if sk // min(bk, sk) < 2:
                    continue
                variants.append((f"ilv bq={bq} bk={bk}", f"{bq}:{bk}"))
        for vtag, ilv in variants:
            attn._ILV = ilv
            try:
                t = amortized(lambda q, k, v: attn.flash_attention(
                    q, k, v, None, scale, False), (q, k, v), n=iters)
                print(f"{tag:8s} {vtag:28s} {t:7.3f} ms "
                      f"({flops/t/1e9:6.1f} TF/s)")
            except Exception as e:
                print(f"{tag:8s} {vtag:28s} FAILED: {str(e)[:90]}")
            finally:
                attn._ILV = ""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench-b", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-blockdiag", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices())
    calibrate()
    if not args.skip_blockdiag:
        blockdiag_study()
    flash_sweep(args.bench_b, args.iters)


if __name__ == "__main__":
    main()
