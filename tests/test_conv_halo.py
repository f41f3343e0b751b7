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
