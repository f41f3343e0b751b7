"""Parity test for the experimental Pallas halo conv (runs in interpret mode
on CPU; the TPU timing lives in docs/PERF.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaprompt_tpu.ops import conv_halo


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="TPU kernel; "
                    "numerics validated on-device (interpret mode diverges "
                    "on manual DMA)")
def test_conv3x3_halo_parity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 320)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 320, 320)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(320) * 0.01, jnp.bfloat16)
    got = jax.jit(conv_halo.conv3x3_halo)(x, w, b)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16) + b
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=0.06)


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="TPU kernel; "
                    "numerics validated on-device (interpret mode diverges "
                    "on manual DMA)")
@pytest.mark.parametrize("hw,cin,cout", [
    (64, 320, 320), (32, 320, 640), (32, 640, 640), (16, 640, 1280),
    (16, 1280, 1280), (64, 640, 320), (32, 1280, 640), (64, 960, 320)])
def test_gn_silu_conv3x3_halo_parity(hw, cin, cout):
    """All SD-UNet ResBlock shapes, incl. the SAME-pad border (the fused
    kernel must keep silu(affine(pad)) masked to zero)."""
    from adaprompt_tpu.ops.layers import group_norm
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), jnp.bfloat16)
    gs = jnp.asarray(1 + 0.1 * rng.standard_normal(cin), jnp.bfloat16)
    gb = jnp.asarray(0.1 * rng.standard_normal(cin), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.02,
                    jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.bfloat16)
    got = jax.jit(conv_halo.gn_silu_conv3x3_halo)(x, gs, gb, w, b)
    h = group_norm(x, gs, gb, num_groups=32, eps=1e-5, activation="silu")
    ref = jax.lax.conv_general_dilated(
        h, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16) + b
    err = np.max(np.abs(np.asarray(got, np.float32)
                        - np.asarray(ref, np.float32)))
    assert err < 0.12 * max(float(np.max(np.abs(np.asarray(ref, np.float32)))),
                            1.0)


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="TPU kernel; "
                    "numerics validated on-device (interpret mode diverges "
                    "on manual DMA)")
@pytest.mark.parametrize("hw,cin,cout", [
    (64, 320, 320), (32, 640, 640), (16, 1280, 1280), (64, 640, 320)])
def test_conv3x3_im2col_parity(hw, cin, cout):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.02,
                    jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.bfloat16)
    got = jax.jit(conv_halo.conv3x3_im2col)(x, w, b)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16) + b
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=0.06)
