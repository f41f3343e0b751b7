"""Shared CLI plumbing: model loading from checkpoints or random init."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from adaprompt_tpu.pipeline import StableDiffusionPipeline
from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

# Persistent compilation cache: subsequent CLI invocations with the same
# shapes skip the multi-minute XLA compile.
_CACHE_DIR = os.environ.get("ADAPROMPT_JAX_CACHE", os.path.expanduser("~/.cache/adaprompt_jax"))
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass


def add_model_args(p):
    p.add_argument("--ckpt", type=str, default=os.environ.get("ADAPROMPT_SD_CKPT"),
                   help="SD-1.5 checkpoint (.ckpt/.safetensors); random init if absent")
    p.add_argument("--tokenizer_dir", type=str,
                   default=os.environ.get("ADAPROMPT_TOKENIZER_DIR"),
                   help="dir with vocab.json + merges.txt (fallback vocab otherwise)")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")


def load_pipeline(args) -> StableDiffusionPipeline:
    tok = CLIPTokenizer.load(args.tokenizer_dir)
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.ckpt and os.path.exists(args.ckpt):
        pipe = StableDiffusionPipeline.from_checkpoint(args.ckpt, tokenizer=tok,
                                                       compute_dtype=dt,
                                                       param_dtype=dt)
    else:
        print("WARNING: no SD checkpoint found — using random weights "
              "(compile/benchmark mode).")
        pipe = StableDiffusionPipeline.random_init(0, tokenizer=tok,
                                                   compute_dtype=dt,
                                                   param_dtype=dt)
    return pipe


def save_images(images, outdir, prefix="sample"):
    from PIL import Image
    os.makedirs(outdir, exist_ok=True)
    paths = []
    for i, img in enumerate(images):
        p = os.path.join(outdir, f"{prefix}-{i:05d}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths
