"""Exact DDIM-50 headline sweep: batch x fused_conv, ONE param init.

Round-4 verdict item 3 (exact-path residual squeeze): measure the two
untested exact-path levers against the same-day baseline —
  - batch >= 16 (VMEM budgets were raised in round 3; does amortization
    still improve past B=8?)
  - ADAPROMPT_FUSED_CONV (the Pallas GN-SiLU-conv halo kernel,
    ops/conv_halo.py — never A/B'd end-to-end before this sweep)

All variants share one random param init and run back-to-back on the same
host (PERF.md within-day rule). Timing: uint8-image host fetch per
generate(), matching bench.py's product-surface methodology.

Usage: python tools/exact_sweep.py [--iters 2] [--steps 50]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = os.path.expanduser("~/.cache/adaprompt_jax")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(m):
    print(m, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batches", default="8,16")
    ap.add_argument("--fused", default="0,1",
                    help="fused_conv values to sweep (0/1)")
    args = ap.parse_args()

    from adaprompt_tpu.pipeline import StableDiffusionPipeline

    t0 = time.perf_counter()
    base = StableDiffusionPipeline.random_init(0, param_dtype=jnp.bfloat16)
    log(f"param init: {time.perf_counter() - t0:.0f}s")

    results = []
    for fused in [bool(int(f)) for f in args.fused.split(",")]:
        # Build the config explicitly for BOTH legs: base.unet_cfg bakes
        # ADAPROMPT_FUSED_CONV/QUANT/TOME from the environment at import, so
        # reusing it for the fused=0 leg would silently run both legs fused
        # whenever that env var is set (round-4 ADVICE).
        pipe = StableDiffusionPipeline(
            base.params, tokenizer=base.tokenizer,
            unet_cfg=dataclasses.replace(base.unet_cfg, fused_conv=fused),
            vae_cfg=base.vae_cfg, text_cfg=base.text_cfg,
            compute_dtype=base.compute_dtype)
        for batch in [int(b) for b in args.batches.split(",")]:
            prompts = ["a portrait photo of a person, detailed,"
                       " studio lighting"] * batch
            tag = f"B={batch} fused_conv={int(fused)}"
            try:
                t0 = time.perf_counter()
                imgs = pipe.generate(prompts, num_steps=args.steps,
                                     height=512, width=512, seed=0)
                np.asarray(imgs)
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                for i in range(args.iters):
                    imgs = pipe.generate(prompts, num_steps=args.steps,
                                         height=512, width=512, seed=i + 1)
                    np.asarray(imgs)
                dt = time.perf_counter() - t0
                ips = (batch * args.iters) / dt
                log(f"[{tag}] warmup+compile={compile_s:.1f}s "
                    f"run={dt:.2f}s -> {ips:.4f} img/s/chip")
                results.append((tag, round(ips, 4)))
            except Exception as e:
                log(f"[{tag}] FAILED: {e!r}")
                results.append((tag, None))
    log("summary: " + "; ".join(f"{t}: {v}" for t, v in results))


if __name__ == "__main__":
    main()
