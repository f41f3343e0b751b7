"""Sweep the COMPOSED serving stack on the real chip: throughput + drift.

Round-4 goal (VERDICT #1): one benched serving path that stacks every
lever — DPM-Solver++(2M) step-count reduction x DeepCache x CFG-tail x
ToMe — and clears 4 img/s/chip with a recorded quality delta. This tool
produces the preset x (img/s, latent drift) table; the winner becomes
bench.py's `serving_img_per_sec` row and the PERF.md speed-quality table.

Drift = relative L2 of final x_0 latents vs the EXACT DDIM-50 run on the
same seed (the reference product path, adaface_wrapper.py:104-141 +
ldm/models/diffusion/ddim.py, serves plain DDIM-50 — so every approximate
or re-solved path is scored against that one reference trajectory). The
UNet out conv is re-randomized (random_init zero-inits it, which would
make every sampler identical and drift vacuously 0 — docs/PERF.md).

Usage: python tools/serving_sweep.py [--batches 8,16] [--iters 3]
       [--configs name1,name2,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (same location as bench.py / cli/common.py):
# the sweep compiles ~2 executables per (config, batch) — cache re-runs
_CACHE_DIR = os.path.expanduser("~/.cache/adaprompt_jax")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(m):
    print(m, file=sys.stderr, flush=True)


MILD = dict(tome_ratio=0.5, tome_mlp=True, cache_interval=2, cache_depth=3,
            cfg_tail_frac=0.2)
ALL = dict(tome_ratio=0.5, tome_mlp=True, cache_interval=3, cache_depth=3,
           cfg_tail_frac=0.3)
AGGR = dict(tome_ratio=0.5, tome_mlp=True, cache_interval=4, cache_depth=3,
            cfg_tail_frac=0.35)

# name -> (sampler, steps, fast-dict|None)
CONFIGS = {
    "ddim50-exact":    ("ddim", 50, None),          # the reference path
    "ddim50+all":      ("ddim", 50, ALL),
    "dpmpp20-exact":   ("dpmpp", 20, None),
    "dpmpp25+mild":    ("dpmpp", 25, MILD),
    "dpmpp20+mild":    ("dpmpp", 20, MILD),
    "dpmpp20+all":     ("dpmpp", 20, ALL),
    "dpmpp20+aggr":    ("dpmpp", 20, AGGR),
    "dpmpp16+mild":    ("dpmpp", 16, MILD),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--latents_only", action="store_true",
                    help="skip the images-executable warmup+timing; time "
                    "the return_latents variant instead (isolates the VAE "
                    "decode share)")
    ap.add_argument("--quant", default=None, choices=[None, "int8"],
                    help="layer the w8a8 int8 UNet path (ops/quant.py) under "
                    "every swept config; drift stays scored against the bf16 "
                    "exact DDIM-50 reference")
    ap.add_argument("--image-metrics", action="store_true",
                    help="also score each preset's DECODED images against "
                    "the exact DDIM-50 images: PSNR/SSIM + shared-random-"
                    "weight ArcFace cosine (eval/image_metrics.py; round-4 "
                    "verdict item 4)")
    args = ap.parse_args()

    from adaprompt_tpu.pipeline import StableDiffusionPipeline, FastConfig

    pipe = StableDiffusionPipeline.random_init(0, param_dtype=jnp.bfloat16)
    oc = pipe.params.unet["out"]["conv"]
    oc["kernel"] = 0.05 * jax.random.normal(jax.random.PRNGKey(7),
                                            oc["kernel"].shape,
                                            oc["kernel"].dtype)
    ref_pipe = pipe
    if args.quant:
        # same params, quantized UNet config; the bf16 pipe stays the drift
        # reference so int8's own error is part of each row's drift number
        pipe = StableDiffusionPipeline(
            pipe.params, tokenizer=pipe.tokenizer, unet_cfg=pipe.unet_cfg,
            vae_cfg=pipe.vae_cfg, text_cfg=pipe.text_cfg,
            compute_dtype=pipe.compute_dtype, quant=args.quant)

    batches = [int(b) for b in args.batches.split(",")]
    names = args.configs.split(",")
    if "ddim50-exact" not in names:
        names = ["ddim50-exact"] + names   # drift reference comes first

    rows = []
    for batch in batches:
        prompts = ["a portrait photo of a person, detailed"] * batch
        ref_latents = None
        solver_exact = {}   # (sampler, steps) -> exact latents, for the
        # second drift column (approximation error alone, solver excluded)
        ref_images = None
        for name in names:
            sampler, steps, fc = CONFIGS[name]
            fast = FastConfig(**fc) if fc is not None else None
            # the drift reference is ALWAYS the bf16 exact DDIM-50 run
            p = ref_pipe if name == "ddim50-exact" else pipe
            t0 = time.perf_counter()
            z = p.generate(prompts, num_steps=steps, height=512, width=512,
                           seed=0, fast=fast, sampler=sampler,
                           return_latents=True)
            z = np.asarray(z, np.float32)
            if fc is None:
                solver_exact[(sampler, steps)] = z
            imgs = None
            if not args.latents_only:
                # images variant is a separate executable (return_latents is
                # a static arg) — warm it before the timing loop
                imgs = np.asarray(
                    p.generate(prompts, num_steps=steps, height=512,
                               width=512, seed=0, fast=fast, sampler=sampler))
            compile_s = time.perf_counter() - t0
            if name == "ddim50-exact":
                ref_images = imgs
            if args.image_metrics and imgs is not None and ref_images is not None:
                from adaprompt_tpu.eval import image_metrics as im
                ps = im.psnr(imgs, ref_images)
                ss = im.ssim(imgs, ref_images)
                cos = im.random_arcface_cosine(imgs, ref_images)
                log(f"B={batch} {name:14s} image-space vs ddim50-exact: "
                    f"psnr={ps:.2f} dB ssim={ss:.4f} arcface_cos={cos:.4f}")
            if name == "ddim50-exact":
                ref_latents = z
            drift = (np.linalg.norm(z - ref_latents)
                     / (np.linalg.norm(ref_latents) + 1e-9))
            se = solver_exact.get((sampler, steps))
            drift_own = (np.linalg.norm(z - se) / (np.linalg.norm(se) + 1e-9)
                         if se is not None else float("nan"))

            t0 = time.perf_counter()
            for i in range(args.iters):
                out = p.generate(prompts, num_steps=steps, height=512,
                                 width=512, seed=i + 1, fast=fast,
                                 sampler=sampler,
                                 return_latents=args.latents_only)
                np.asarray(out)
            dt = time.perf_counter() - t0
            ips = batch * args.iters / dt
            rows.append((batch, name, ips, drift, drift_own, compile_s))
            log(f"B={batch} {name:14s} {ips:6.3f} img/s  drift={drift:.4f}"
                f" own={drift_own:.4f}  (compile+warmup {compile_s:.0f}s,"
                f" run {dt:.1f}s)")

    log("")
    log(f"{'B':>3s} {'config':14s} {'img/s':>7s} {'vs ddim50':>10s} "
        f"{'drift/ddim50':>13s} {'drift/own':>10s}")
    base = {b: next(r[2] for r in rows if r[0] == b and r[1] == "ddim50-exact")
            for b in batches}
    for batch, name, ips, drift, drift_own, _ in rows:
        log(f"{batch:3d} {name:14s} {ips:7.3f} {ips / base[batch]:9.2f}x "
            f"{drift:13.4f} {drift_own:10.4f}")


if __name__ == "__main__":
    main()
