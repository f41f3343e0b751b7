"""Fused GEGLU kernel parity (interpret mode) + VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaprompt_tpu.ops import geglu as gg


@pytest.mark.parametrize("m,c,f", [(64, 128, 512), (32, 256, 1024)])
def test_geglu_forward_parity(m, c, f):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (m, c), jnp.float32)
    w1 = jax.random.normal(ks[1], (c, 2 * f), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (2 * f,), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[3], (f, c), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (c,), jnp.float32) * 0.05
    ref = gg.geglu_reference(x, w1, b1, w2, b2)
    out = gg.geglu(x, w1, b1, w2, b2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_geglu_batched_shape_and_vjp():
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    b, n, c, f = 2, 32, 128, 512
    x = jax.random.normal(ks[0], (b, n, c), jnp.float32)
    w1 = jax.random.normal(ks[1], (c, 2 * f), jnp.float32) * 0.05
    b1 = jnp.zeros((2 * f,))
    w2 = jax.random.normal(ks[3], (f, c), jnp.float32) * 0.05
    b2 = jnp.zeros((c,))
    out = gg.geglu(x, w1, b1, w2, b2, True)
    assert out.shape == (b, n, c)

    def f_fused(x, w1, w2):
        return jnp.sum(gg.geglu(x, w1, b1, w2, b2, True) ** 2)

    def f_ref(x, w1, w2):
        return jnp.sum(gg.geglu_reference(x, w1, b1, w2, b2) ** 2)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(x, w1, w2)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_erf_approx_accuracy():
    x = jnp.linspace(-4, 4, 1001, dtype=jnp.float32)
    import scipy.special as sp
    np.testing.assert_allclose(np.asarray(gg._erf_approx(x)),
                               sp.erf(np.asarray(x)), atol=1e-6)


def test_geglu_vjp_bf16():
    """bf16 inputs (the train path) must round-trip through the custom
    VJP without dtype mismatches."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(ks[0], (16, 128), jnp.bfloat16)
    w1 = (jax.random.normal(ks[1], (128, 512)) * 0.05).astype(jnp.bfloat16)
    b1 = jnp.zeros((512,), jnp.bfloat16)
    w2 = (jax.random.normal(ks[2], (256, 128)) * 0.05).astype(jnp.bfloat16)
    b2 = jnp.zeros((128,), jnp.bfloat16)
    dx = jax.grad(lambda x: jnp.sum(
        gg.geglu(x, w1, b1, w2, b2, True).astype(jnp.float32)))(x)
    assert dx.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(dx, np.float32)).all()
