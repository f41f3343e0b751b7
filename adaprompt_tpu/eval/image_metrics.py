"""Image-space quality metrics for the serving speed x quality table.

The serving presets (pipeline.FastConfig + solver choice) were previously
graded only by relative LATENT L2 drift; these helpers put image-space
numbers on every preset (round-4 verdict item 4): PSNR and SSIM between a
preset's decoded images and the exact-DDIM-50 reference images, plus a
random-feature perceptual cosine through the in-repo ArcFace IResNet with
SHARED RANDOM weights (no assets needed; a fixed random deep net is a
standard perceptual-distance proxy — distances through it correlate with
structural image change far better than raw pixels).

Reference quality bar being approximated: evaluation/eval_utils.py:268-335
scores generated sets with real ArcFace embeddings; that gate runs via
tools/run_fidelity_gate.sh the day real weights exist.
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB over uint8-range images [..., H, W, C]."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _box(x: np.ndarray, w: int) -> np.ndarray:
    """Mean filter with a w x w box over the last two spatial axes of
    [..., H, W] via cumsum (no scipy dependency)."""
    pad = w // 2
    x = np.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)],
               mode="reflect")
    c = np.cumsum(np.cumsum(x, axis=-2), axis=-1)
    c = np.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])
    out = (c[..., w:, w:] - c[..., :-w, w:] - c[..., w:, :-w]
           + c[..., :-w, :-w]) / (w * w)
    return out


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0,
         win: int = 7) -> float:
    """Mean SSIM over [..., H, W, C] images (uniform window, standard
    C1/C2 stabilizers; matches skimage's structural_similarity with
    gaussian_weights=False up to boundary handling)."""
    a = np.moveaxis(np.asarray(a, np.float64), -1, 0)   # [C, ..., H, W]
    b = np.moveaxis(np.asarray(b, np.float64), -1, 0)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = _box(a, win), _box(b, win)
    var_a = _box(a * a, win) - mu_a ** 2
    var_b = _box(b * b, win) - mu_b ** 2
    cov = _box(a * b, win) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(np.mean(s))


def random_arcface_cosine(imgs_a: np.ndarray, imgs_b: np.ndarray,
                          arcface_params=None, seed: int = 0,
                          small: bool = False) -> float:
    """Mean cosine similarity of ArcFace-IResNet embeddings of two aligned
    uint8 image batches [N, H, W, 3], using SHARED RANDOM weights (seeded)
    when arcface_params is None. Full images are resized to the 112x112
    ArcFace input (no detection: both batches share layout by
    construction — same seed, same prompt). small=True uses the IResNet-18
    trunk (CPU-test-sized); the chip sweep uses the production IResNet-100."""
    import jax
    import jax.numpy as jnp
    from adaprompt_tpu.models import arcface

    cfg = arcface.IRESNET18 if small else arcface.IRESNET100
    if arcface_params is None:
        arcface_params = arcface.init_params(jax.random.PRNGKey(seed), cfg)

    def prep(imgs):
        x = jnp.asarray(imgs, jnp.float32)
        x = jax.image.resize(x, (x.shape[0], 112, 112, 3), "bilinear")
        return (x - 127.5) / 127.5

    @jax.jit
    def embed(x):
        return arcface.forward(arcface_params, x, cfg)

    ea = np.asarray(embed(prep(imgs_a)), np.float64)
    eb = np.asarray(embed(prep(imgs_b)), np.float64)
    ea /= np.linalg.norm(ea, axis=-1, keepdims=True) + 1e-12
    eb /= np.linalg.norm(eb, axis=-1, keepdims=True) + 1e-12
    return float(np.mean(np.sum(ea * eb, axis=-1)))
