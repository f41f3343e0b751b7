"""Sweep FastConfig serving presets on the real chip: throughput + drift.

For each preset, times the full 512x512 DDIM-50 pipeline (same methodology
as bench.py: host-transfer sync, warmup excluded) and reports the latent
drift vs the exact sampler on the same seed — relative L2 over the final
x_0 latents. Drift with random weights is only a structural sanity signal
(real quality validation needs a trained checkpoint; docs/PERF.md), but it
cleanly separates "approximation" from "broken".

Usage: python tools/fastpath_bench.py [--batch 8] [--iters 3] [--steps 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


PRESETS = {
    "exact": None,
    "tome.5": dict(tome_ratio=0.5, tome_mlp=True, cache_interval=1,
                   cache_depth=1, cfg_tail_frac=0.0),
    "cache3d3": dict(tome_ratio=0.0, cache_interval=3, cache_depth=3,
                     cfg_tail_frac=0.0),
    "cache2d3": dict(tome_ratio=0.0, cache_interval=2, cache_depth=3,
                     cfg_tail_frac=0.0),
    "cache3d5": dict(tome_ratio=0.0, cache_interval=3, cache_depth=5,
                     cfg_tail_frac=0.0),
    "tail.3": dict(tome_ratio=0.0, cache_interval=1, cache_depth=1,
                   cfg_tail_frac=0.3),
    "fast(all)": dict(tome_ratio=0.5, tome_mlp=True, cache_interval=3,
                      cache_depth=3, cfg_tail_frac=0.3),
    "fast(mild)": dict(tome_ratio=0.5, tome_mlp=True, cache_interval=2,
                       cache_depth=3, cfg_tail_frac=0.2),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--presets", default=",".join(PRESETS))
    args = ap.parse_args()

    import jax
    from adaprompt_tpu.pipeline import StableDiffusionPipeline, FastConfig

    pipe = StableDiffusionPipeline.random_init(0, param_dtype=jnp.bfloat16)
    # random_init zero-inits the UNet out conv (reference zero_module), so
    # eps == 0 and every sampler produces the SAME trajectory — drift would
    # be vacuously zero. Re-randomize it so the UNet is a nontrivial
    # function and the drift signal is structural, not degenerate.
    oc = pipe.params.unet["out"]["conv"]
    oc["kernel"] = 0.05 * jax.random.normal(jax.random.PRNGKey(7),
                                            oc["kernel"].shape,
                                            oc["kernel"].dtype)
    prompts = ["a portrait photo of a person, detailed"] * args.batch

    ref_latents = None
    rows = []
    for name in args.presets.split(","):
        fc = PRESETS[name]
        fast = FastConfig(**fc) if fc is not None else None
        t0 = time.perf_counter()
        z = pipe.generate(prompts, num_steps=args.steps, height=512,
                          width=512, seed=0, fast=fast, return_latents=True)
        z = np.asarray(z, np.float32)
        # warm up the images-variant executable too (return_latents is a
        # static arg -> separate compile; the first version of this tool
        # timed that compile inside the "run" loop and measured nothing)
        np.asarray(pipe.generate(prompts, num_steps=args.steps, height=512,
                                 width=512, seed=0, fast=fast))
        compile_s = time.perf_counter() - t0
        if name == "exact":
            ref_latents = z
        drift = (np.linalg.norm(z - ref_latents)
                 / (np.linalg.norm(ref_latents) + 1e-9)
                 if ref_latents is not None else float("nan"))

        t0 = time.perf_counter()
        for i in range(args.iters):
            imgs = pipe.generate(prompts, num_steps=args.steps, height=512,
                                 width=512, seed=i + 1, fast=fast)
            np.asarray(imgs)
        dt = time.perf_counter() - t0
        ips = args.batch * args.iters / dt
        rows.append((name, ips, drift, compile_s))
        log(f"{name:12s} {ips:6.3f} img/s  drift={drift:.4f} "
            f"(compile+warmup {compile_s:.0f}s, run {dt:.1f}s)")

    log("")
    log(f"{'preset':12s} {'img/s':>7s} {'vs exact':>9s} {'latent drift':>13s}")
    base = rows[0][1]
    for name, ips, drift, _ in rows:
        log(f"{name:12s} {ips:7.3f} {ips / base:8.2f}x {drift:13.4f}")


if __name__ == "__main__":
    main()
