"""Serving-preset drift bounds — the regression gate behind docs/PERF.md's
speed x quality table (VERDICT r3 #2).

Production-shape numbers (512x512, SD-1.5 UNet, real chip) live in
docs/PERF.md and are produced by tools/serving_sweep.py; this module pins
the SAME preset structure on the CPU-sized pipeline so that a silent
approximation regression (broken cache indexing, wrong tail segmentation,
solver-state corruption through the fast loop, ...) breaks the suite
instead of only showing up in the next chip sweep. Drift = relative L2 of
final x_0 latents vs the same-solver exact run on the same seed; the out
conv is re-randomized because random_init zero-inits it (reference
zero_module semantics), which would make all samplers identical and every
drift vacuously 0.

Bounds are ~10x the measured tiny-model values (mild .0004/.0009,
all .0008/.0017, aggr .0023 — the tiny random model is far less
approximation-sensitive than production, where mild measures ~0.11): loose
enough for platform/seed noise, tight enough that a structural break
(which jumps drift >100x) fails.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaprompt_tpu.pipeline import FastConfig

from tests.test_pipeline import tiny_pipeline

pytestmark = pytest.mark.slow

STEPS_EXACT = 50
H = W = 64

# preset name -> (sampler, steps, FastConfig kwargs, drift bound vs the
# same-solver exact run). Presets mirror tools/serving_sweep.py.
PRESETS = {
    "ddim50+mild":  ("ddim", 50, dict(tome_ratio=0.5, tome_mlp=True,
                                      cache_interval=2, cache_depth=3,
                                      cfg_tail_frac=0.2), 0.006),
    "ddim50+all":   ("ddim", 50, dict(tome_ratio=0.5, tome_mlp=True,
                                      cache_interval=3, cache_depth=3,
                                      cfg_tail_frac=0.3), 0.012),
    "dpmpp20+mild": ("dpmpp", 20, dict(tome_ratio=0.5, tome_mlp=True,
                                       cache_interval=2, cache_depth=3,
                                       cfg_tail_frac=0.2), 0.012),
    "dpmpp20+all":  ("dpmpp", 20, dict(tome_ratio=0.5, tome_mlp=True,
                                       cache_interval=3, cache_depth=3,
                                       cfg_tail_frac=0.3), 0.020),
    "dpmpp20+aggr": ("dpmpp", 20, dict(tome_ratio=0.5, tome_mlp=True,
                                       cache_interval=4, cache_depth=3,
                                       cfg_tail_frac=0.35), 0.030),
}


@pytest.fixture(scope="module")
def pipe():
    p = tiny_pipeline()
    oc = p.params.unet["out"]["conv"]
    oc["kernel"] = 0.05 * jax.random.normal(jax.random.PRNGKey(7),
                                            oc["kernel"].shape,
                                            oc["kernel"].dtype)
    return p


def _latents(pipe, sampler, steps, fast=None):
    z = pipe.generate(["a portrait of a person"], num_steps=steps,
                      height=H, width=W, seed=0, sampler=sampler,
                      fast=fast, return_latents=True)
    return np.asarray(z, np.float32)


def _drift(a, b):
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


@pytest.fixture(scope="module")
def exact(pipe):
    return {"ddim": _latents(pipe, "ddim", STEPS_EXACT),
            "dpmpp": _latents(pipe, "dpmpp", 20)}


def test_solvers_agree_on_the_ode(pipe, exact):
    """dpmpp-20 vs ddim-50: different discretizations of the same ODE must
    land near the same x_0 (this is the solver-quality claim behind serving
    with 20 steps; measured 0.06-0.17 tiny/production)."""
    d = _drift(exact["dpmpp"], exact["ddim"])
    assert d < 0.30, d


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_drift_bounds(pipe, exact, name):
    sampler, steps, fc, bound = PRESETS[name]
    z = _latents(pipe, sampler, steps, fast=FastConfig(**fc))
    d = _drift(z, exact[sampler])
    print(f"{name}: drift={d:.4f} (bound {bound})")
    assert d < bound, (name, d, bound)
    # drift must also be nonzero — a vacuously-exact run means the fast
    # path silently stopped applying its approximations
    assert d > 1e-5, (name, d)


def test_noop_preset_is_exact(pipe, exact):
    """FastConfig with every lever off must reproduce the exact sampler
    through the shared fastloop driver (both solvers)."""
    noop = FastConfig(tome_ratio=0.0, cache_interval=1, cache_depth=1,
                      cfg_tail_frac=0.0)
    for sampler, steps in (("ddim", STEPS_EXACT), ("dpmpp", 20)):
        z = _latents(pipe, sampler, steps, fast=noop)
        np.testing.assert_allclose(z, exact[sampler], atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Image-space tier (round-4 verdict item 4): presets graded on DECODED
# images against the exact DDIM-50 product path, not just latent L2 —
# PSNR/SSIM plus a random-feature perceptual cosine through the in-repo
# ArcFace IResNet (shared random weights; eval/image_metrics.py).
# Production-shape numbers land in docs/PERF.md via tools/serving_sweep.py
# --image-metrics; these CPU-sized bounds catch structural regressions.
# ---------------------------------------------------------------------------

from adaprompt_tpu.eval import image_metrics as im


def _images(pipe, sampler, steps, fast=None):
    x = pipe.generate(["a portrait of a person"], num_steps=steps,
                      height=H, width=W, seed=0, sampler=sampler, fast=fast)
    return np.asarray(x)


@pytest.fixture(scope="module")
def exact_images(pipe):
    return _images(pipe, "ddim", STEPS_EXACT)


# preset -> (min PSNR dB vs exact DDIM-50 images, min SSIM, min arcface cos)
IMAGE_BOUNDS = {
    "dpmpp20+mild": (24.0, 0.80, 0.90),
    "dpmpp20+aggr": (24.0, 0.80, 0.90),
}


@pytest.mark.parametrize("name", sorted(IMAGE_BOUNDS))
def test_preset_image_space_quality(pipe, exact_images, name):
    sampler, steps, fc, _ = PRESETS[name]
    imgs = _images(pipe, sampler, steps, fast=FastConfig(**fc))
    p = im.psnr(imgs, exact_images)
    s = im.ssim(imgs, exact_images)
    c = im.random_arcface_cosine(imgs, exact_images, small=True)
    print(f"{name}: psnr={p:.2f} dB ssim={s:.4f} arcface_cos={c:.4f}")
    min_p, min_s, min_c = IMAGE_BOUNDS[name]
    assert p > min_p, (name, "psnr", p)
    assert s > min_s, (name, "ssim", s)
    assert c > min_c, (name, "arcface_cos", c)
    # and not vacuously identical (approximations must be active)
    assert p < 60.0, (name, "suspiciously exact", p)
