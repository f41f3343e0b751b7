"""Parity: adaprompt_tpu.train.losses vs /root/reference/ldm/util.py and
ddpm.calc_recon_loss."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from adaprompt_tpu.train import losses as jl

import torch_oracle


@pytest.fixture(scope="module")
def lutil():
    return torch_oracle.load("ldm.util")


def test_ortho_subtract_parity(lutil):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 5, 8)).astype(np.float32)
    b = rng.standard_normal((2, 5, 8)).astype(np.float32)
    ref = lutil.ortho_subtract(torch.tensor(a), torch.tensor(b)).numpy()
    got = jl.ortho_subtract(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-4)

    ref2 = lutil.ortho_subtract(torch.tensor(a), torch.tensor(b), on_last_n_dims=2).numpy()
    got2 = jl.ortho_subtract(jnp.asarray(a), jnp.asarray(b), on_last_n_dims=2)
    np.testing.assert_allclose(np.asarray(got2), ref2, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("demean_first,grad_scale,align", [
    (True, 0.05, True), (False, 0.0, True), (True, 0.5, False)])
def test_calc_ref_cosine_loss_parity(lutil, demean_first, grad_scale, align):
    rng = np.random.default_rng(1)
    delta = rng.standard_normal((2, 4, 7, 8)).astype(np.float32)
    ref_delta = rng.standard_normal((2, 4, 7, 8)).astype(np.float32)
    mask = (rng.random((2, 1, 7, 1)) > 0.3).astype(np.float32)
    with torch.no_grad():
        ref = lutil.calc_ref_cosine_loss(
            torch.tensor(delta), torch.tensor(ref_delta),
            emb_mask=torch.tensor(mask), do_demean_first=demean_first,
            first_n_dims_to_flatten=3, ref_grad_scale=grad_scale,
            aim_to_align=align)
    got = jl.calc_ref_cosine_loss(
        jnp.asarray(delta), jnp.asarray(ref_delta), emb_mask=jnp.asarray(mask),
        do_demean_first=demean_first, first_n_dims_to_flatten=3,
        ref_grad_scale=grad_scale, aim_to_align=align)
    np.testing.assert_allclose(float(got), float(ref), atol=1e-5, rtol=1e-4)


def test_prompt_emb_delta_loss_parity(lutil):
    rng = np.random.default_rng(2)
    embs = rng.standard_normal((4, 16, 11, 8)).astype(np.float32)
    mask = (rng.random((4, 11, 1)) > 0.25).astype(np.float32)
    with torch.no_grad():
        ref = lutil.calc_prompt_emb_delta_loss(torch.tensor(embs), torch.tensor(mask))
    got = jl.calc_prompt_emb_delta_loss(jnp.asarray(embs), jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-5, rtol=1e-4)


def test_recon_loss_weighting():
    rng = np.random.default_rng(3)
    out = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    tgt = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    fg = np.zeros((2, 4, 4, 1), np.float32)
    fg[:, :2] = 1.0
    # bg weight 0: only fg pixels count
    l_fg_only = jl.calc_recon_loss(jnp.asarray(out), jnp.asarray(tgt), None,
                                   jnp.asarray(fg), bg_pixel_weight=0.0)
    want = np.mean((out[:, :2] - tgt[:, :2]) ** 2)
    np.testing.assert_allclose(float(l_fg_only), want, rtol=1e-5)
    # uniform weights == plain mse
    l_all = jl.calc_recon_loss(jnp.asarray(out), jnp.asarray(tgt), None, None)
    np.testing.assert_allclose(float(l_all), np.mean((out - tgt) ** 2), rtol=1e-5)
