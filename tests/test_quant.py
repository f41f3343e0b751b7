"""ops/quant.py: int8 w8a8 linear correctness/error bounds (CPU-runnable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaprompt_tpu.ops import quant


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (320, 640), jnp.float32)
    w_q, scale = quant.quantize_weight(w)
    assert w_q.dtype == jnp.int8
    back = np.asarray(w_q, np.float32) * np.asarray(scale)
    # 8-bit symmetric, scale=absmax/127 (~3.4 sigma at K=320): step
    # ~0.027 sigma -> RMS error ~0.8% of signal
    assert _rel_err(back, w) < 0.01


def test_int8_linear_error_bound():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (64, 320), jnp.float32)
    w = jax.random.normal(k2, (320, 1280), jnp.float32) * 0.05
    b = jax.random.normal(k3, (1280,), jnp.float32)
    exact = x @ w + b
    y = quant.int8_linear(x, w, b, out_dtype=jnp.float32)
    assert y.shape == exact.shape
    assert _rel_err(y, exact) < 0.01


def test_int8_linear_batched_and_dtype():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (128, 64), jnp.bfloat16)
    y = quant.int8_linear(x, w)
    assert y.shape == (2, 16, 64)
    assert y.dtype == jnp.bfloat16
    exact = jnp.einsum("bmk,kn->bmn", x.astype(jnp.float32),
                       w.astype(jnp.float32))
    assert _rel_err(y.astype(jnp.float32), exact) < 0.02


def test_int8_matmul_2operand_pv_shape():
    # attention PV: P [BH, Sq, Sk] probabilities, V [BH, Sk, D]
    kp, kv = jax.random.split(jax.random.PRNGKey(4))
    p = jax.nn.softmax(jax.random.normal(kp, (4, 64, 64)) * 3.0, axis=-1)
    v = jax.random.normal(kv, (4, 64, 40), jnp.float32)
    exact = jnp.einsum("bqk,bkd->bqd", p, v)
    y = quant.int8_matmul_2operand(p, v, out_dtype=jnp.float32)
    assert y.shape == exact.shape
    assert _rel_err(y, exact) < 0.02


def test_int8_linear_outlier_tokens_stay_accurate():
    # per-token scales: one huge-magnitude row must not wreck the others
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 256), jnp.float32)
    x = x.at[3].mul(1000.0)
    w = jax.random.normal(jax.random.PRNGKey(6), (256, 64), jnp.float32)
    exact = x @ w
    y = quant.int8_linear(x, w, out_dtype=jnp.float32)
    for i in range(8):
        assert _rel_err(y[i], exact[i]) < 0.02, i
