"""Parity: conv subject-token attention vs replace_rows_by_conv_attn."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from adaprompt_tpu.ops import conv_attn as jca

import torch_oracle


@pytest.mark.parametrize("ks,shift", [(2, True), (3, True), (3, False)])
def test_conv_attn_parity(ks, shift):
    lutil = torch_oracle.load("ldm.util")
    rng = np.random.default_rng(0)
    B, H, hgt, wdt, C, T = 4, 2, 8, 8, 16, 13
    N = hgt * wdt
    M = 9  # embeddings per subject token (>= ks*ks)
    BS = 2
    q = rng.standard_normal((B, H, N, C)).astype(np.float32) * 0.3
    k = rng.standard_normal((B, H, T, C)).astype(np.float32) * 0.3
    attn = rng.standard_normal((B, H, N, T)).astype(np.float32)
    pos = np.stack([np.arange(3, 3 + M), np.arange(4, 4 + M)])  # [BS, M]
    sim_scale = C ** -0.5

    indices_B = torch.tensor(np.repeat(np.arange(BS), M))
    indices_N = torch.tensor(pos.reshape(-1))
    with torch.no_grad():
        ref = lutil.replace_rows_by_conv_attn(
            torch.tensor(attn.reshape(B * H, N, T)),
            torch.tensor(q.reshape(B * H, N, C)),
            torch.tensor(k.reshape(B * H, T, C)),
            (indices_B, indices_N), torch.Size((hgt, wdt)), ks, H,
            sim_scale, conv_attn_mix_weight=0.7,
            shift_attn_maps_for_diff_embs=shift)
    ref = ref.numpy().reshape(B, H, N, T)

    got = jca.replace_rows_by_conv_attn(
        jnp.asarray(attn), jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos),
        (hgt, wdt), ks, sim_scale, conv_attn_mix_weight=0.7,
        shift_attn_maps_for_diff_embs=shift)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-3)


def test_ks1_identity():
    attn = jnp.ones((1, 2, 4, 5))
    out = jca.replace_rows_by_conv_attn(attn, None, None, jnp.zeros((1, 1), jnp.int32),
                                        (2, 2), 1, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(attn))
