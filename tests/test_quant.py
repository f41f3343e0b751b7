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


def test_flash_attention_int8_close_to_exact():
    """int8-QK flash (sampler quant path) vs the exact XLA attention:
    K mean-centering + per-token int8 quant should keep outputs within a
    small fraction of the activation scale (SageAttention-style design)."""
    from adaprompt_tpu.ops.attention import (_attention_xla,
                                             flash_attention_int8)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    b, s, h, d = 1, 256, 2, 40
    q = jax.random.normal(k1, (b, s, h, d), jnp.float32)
    k = jax.random.normal(k2, (b, s, h, d), jnp.float32) + 0.7  # nonzero mean
    v = jax.random.normal(k3, (b, s, h, d), jnp.float32)
    scale = d ** -0.5
    ref = _attention_xla(q, k, v, None, None, scale)
    out = flash_attention_int8(q, k, v, None, scale, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 0.06, err.max()
    assert err.mean() < 0.01, err.mean()

    # key_bias (img_mask) must be honored
    bias = np.zeros((b, s), np.float32)
    bias[:, s // 2:] = -1e9
    bias = jnp.asarray(bias)
    ref_b = _attention_xla(q, k, v, None, bias, scale)
    out_b = flash_attention_int8(q, k, v, bias, scale, interpret=True)
    assert np.abs(np.asarray(out_b) - np.asarray(ref_b)).max() < 0.06


def test_geglu_int8_close_to_reference():
    """Fused w8a8 GEGLU kernel vs the exact XLA reference."""
    from adaprompt_tpu.ops.geglu import geglu_int8, geglu_reference
    c, f = 64, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[0], (32, c), jnp.float32)
    w1 = jax.random.normal(ks[1], (c, 2 * f), jnp.float32) * 0.1
    b1 = jax.random.normal(ks[2], (2 * f,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (f, c), jnp.float32) * 0.1
    b2 = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1
    ref = geglu_reference(x, w1, b1, w2, b2)
    out = geglu_int8(x, w1, b1, w2, b2, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / (np.abs(np.asarray(ref)).max() + 1e-8)
    assert rel < 0.05, rel


def test_fused_cross_attention_int8_close():
    """w8a8 fused cross-attention kernel vs the unfused exact chain."""
    from adaprompt_tpu.ops.attention import (_attention_xla,
                                             fused_cross_attention_int8)
    b, n, c, s, heads = 1, 64, 32, 16, 4
    hd = c // heads
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    x = jax.random.normal(ks[0], (b, n, c), jnp.float32)
    wq = jax.random.normal(ks[1], (c, c), jnp.float32) * 0.2
    wo = jax.random.normal(ks[2], (c, c), jnp.float32) * 0.2
    bo = jax.random.normal(ks[3], (c,), jnp.float32) * 0.1
    k = jax.random.normal(ks[4], (b, s, heads, hd), jnp.float32)
    v = jax.random.normal(ks[5], (b, s, heads, hd), jnp.float32)
    scale = hd ** -0.5

    q = (x @ wq).reshape(b, n, heads, hd)
    attn = _attention_xla(q, k, v, None, None, scale).reshape(b, n, c)
    ref = attn @ wo + bo
    out = fused_cross_attention_int8(x, wq, k, v, wo, bo, scale, heads,
                                     interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / (np.abs(np.asarray(ref)).max() + 1e-8)
    assert rel < 0.05, rel
