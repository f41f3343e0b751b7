"""Parity: adaprompt_tpu.train.fgbg vs the reference fg/bg attention
regularizers (ddpm.py methods, called unbound on shared random captures)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from adaprompt_tpu.train import fgbg as jf

import torch_oracle

B = 2           # block size
HEADS = 4
S = 13          # text tokens
SUBJ_POS = [4, 5, 6]
BG_POS = [9]
LAYER_HW = {7: 8, 8: 8, 12: 4, 16: 8, 17: 8, 18: 8, 19: 16, 20: 16, 21: 16,
            22: 16, 23: 16, 24: 16}


@pytest.fixture(scope="module")
def captures():
    rng = np.random.default_rng(0)
    attns_t, attns_j = {}, {}
    for li, hw in LAYER_HW.items():
        at = (rng.random((B, HEADS, hw * hw, S)) * 2 - 1).astype(np.float32)
        attns_t[li] = torch.tensor(at)
        attns_j[li] = jnp.asarray(at)
    fg = (rng.random((B, 32, 32)) > 0.5).astype(np.float32)
    return attns_t, attns_j, fg


def _indices(pos, k_per=None):
    b_idx = torch.repeat_interleave(torch.arange(B), len(pos))
    t_idx = torch.tensor(pos * B)
    return (b_idx, t_idx)


def test_fg_mb_suppress_parity(captures):
    ddpm_mod = torch_oracle.load("ldm.models.diffusion.ddpm")
    attns_t, attns_j, fg = captures
    with torch.no_grad():
        ref = ddpm_mod.LatentDiffusion.calc_fg_mb_suppress_loss(
            None, attns_t, _indices(SUBJ_POS), B,
            torch.tensor(fg[:, None]))
    got = jf.calc_fg_mb_suppress_loss(attns_j, SUBJ_POS, B,
                                      jnp.asarray(fg[..., None]))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-5, rtol=1e-3)


def test_fg_bg_complementary_parity(captures):
    ddpm_mod = torch_oracle.load("ldm.models.diffusion.ddpm")
    attns_t, attns_j, fg = captures
    with torch.no_grad():
        ref = ddpm_mod.LatentDiffusion.calc_fg_bg_complementary_loss(
            None, attns_t, _indices(SUBJ_POS), _indices(BG_POS), B,
            fg_grad_scale=0.1, fg_mask=torch.tensor(fg[:, None]))
    got = jf.calc_fg_bg_complementary_loss(attns_j, SUBJ_POS, BG_POS, B,
                                           fg_grad_scale=0.1,
                                           fg_mask=jnp.asarray(fg[..., None]))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(float(g), float(r), atol=1e-5, rtol=1e-3)


def test_fg_bg_xlayer_consist_parity(captures):
    ddpm_mod = torch_oracle.load("ldm.models.diffusion.ddpm")
    attns_t, attns_j, fg = captures
    with torch.no_grad():
        ref = ddpm_mod.LatentDiffusion.calc_fg_bg_xlayer_consist_loss(
            None, attns_t, _indices(SUBJ_POS), _indices(BG_POS), B)
    got = jf.calc_fg_bg_xlayer_consist_loss(attns_j, SUBJ_POS, BG_POS, B)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(float(g), float(r), atol=1e-4, rtol=2e-3)
