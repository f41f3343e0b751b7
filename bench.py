"""Headline benchmark: 512x512 images/sec/chip at DDIM-50 (BASELINE.md
target: >= 4 img/s/chip on v5e).

Runs the full compiled denoise-to-decode pipeline (SD-1.5-sized UNet + VAE,
bf16) on the available accelerator. Uses random weights when no checkpoint
is present (same compute as trained weights). Prints ONE JSON line.

Env knobs: ADAPROMPT_BENCH_BATCH (default 4), ADAPROMPT_BENCH_STEPS (50),
ADAPROMPT_SD_CKPT (optional checkpoint path).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMGS_PER_SEC = 4.0  # BASELINE.json north-star


def main():
    from adaprompt_tpu.pipeline import StableDiffusionPipeline

    batch = int(os.environ.get("ADAPROMPT_BENCH_BATCH", "4"))
    steps = int(os.environ.get("ADAPROMPT_BENCH_STEPS", "50"))
    ckpt = os.environ.get("ADAPROMPT_SD_CKPT")

    if ckpt and os.path.exists(ckpt):
        pipe = StableDiffusionPipeline.from_checkpoint(ckpt, param_dtype=jnp.bfloat16)
    else:
        pipe = StableDiffusionPipeline.random_init(0, param_dtype=jnp.bfloat16)

    prompts = ["a portrait photo of a person, detailed, studio lighting"] * batch

    # warmup/compile
    pipe.generate(prompts, num_steps=steps, height=512, width=512, seed=0)

    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        imgs = pipe.generate(prompts, num_steps=steps, height=512, width=512, seed=i + 1)
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    imgs_per_sec_per_chip = (batch * n_iters) / dt / n_chips

    print(json.dumps({
        "metric": "images_per_sec_per_chip_512px_ddim50",
        "value": round(imgs_per_sec_per_chip, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / BASELINE_IMGS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
