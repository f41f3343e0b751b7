"""Flash-attention kernel parity: forward and VJP vs the XLA path.

Runs the Pallas kernels in interpreter mode (CPU backend). On TPU the same
kernels execute compiled; numerics are additionally exercised on-device by
bench.py and the train steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaprompt_tpu.ops import attention as attn


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("sq,sk,h,d", [(512, 512, 2, 40), (1024, 77, 2, 40)])
def test_flash_forward_matches_xla(sq, sk, h, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(ks[0], 1, sq, h, d)
    k = _rand(ks[1], 1, sk, h, d)
    v = _rand(ks[2], 1, sk, h, d)
    scale = d ** -0.5
    ref = attn._attention_xla(q, k, v, None, None, scale)
    out = attn.flash_attention(q, k, v, None, scale, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_forward_key_bias():
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    b, sq, h, d = 2, 512, 2, 40
    q = _rand(ks[0], b, sq, h, d)
    k = _rand(ks[1], b, sq, h, d)
    v = _rand(ks[2], b, sq, h, d)
    keep = jax.random.bernoulli(ks[3], 0.7, (b, sq)).astype(jnp.float32)
    bias = (keep - 1.0) * (-attn.NEG_BIG)
    scale = d ** -0.5
    ref = attn._attention_xla(q, k, v, None, bias, scale)
    out = attn.flash_attention(q, k, v, bias, scale, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_bias", [False, True])
def test_flash_vjp_matches_xla(with_bias):
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    b, sq, h, d = 1, 512, 2, 40
    q = _rand(ks[0], b, sq, h, d)
    k = _rand(ks[1], b, sq, h, d)
    v = _rand(ks[2], b, sq, h, d)
    if with_bias:
        keep = jax.random.bernoulli(ks[3], 0.8, (b, sq)).astype(jnp.float32)
        bias = (keep - 1.0) * (-attn.NEG_BIG)
    else:
        bias = None
    scale = d ** -0.5
    g = _rand(ks[4], b, sq, h, d)

    def f_ref(q, k, v):
        return jnp.sum(attn._attention_xla(q, k, v, None, bias, scale) * g)

    def f_flash(q, k, v):
        return jnp.sum(attn.flash_attention(q, k, v, bias, scale, True) * g)

    ref_grads = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    fl_grads = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    for a, bgrad in zip(fl_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bgrad),
                                   rtol=2e-4, atol=2e-4)


def test_flash_vjp_bf16_inputs():
    """Train steps run bf16; cotangents must come back bf16 without error."""
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    b, sq, h, d = 1, 512, 1, 40
    q = _rand(ks[0], b, sq, h, d).astype(jnp.bfloat16)
    k = _rand(ks[1], b, sq, h, d).astype(jnp.bfloat16)
    v = _rand(ks[2], b, sq, h, d).astype(jnp.bfloat16)
    scale = d ** -0.5

    def f(q, k, v):
        return jnp.sum(attn.flash_attention(q, k, v, None, scale, True)
                       .astype(jnp.float32))

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    assert dq.dtype == jnp.bfloat16 and dk.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(dq, np.float32)).all()


def test_dot_product_attention_key_bias_xla():
    """key_bias on the XLA path equals building the full additive mask."""
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    b, s, h, d = 2, 64, 2, 16
    q = _rand(ks[0], b, s, h, d)
    k = _rand(ks[1], b, s, h, d)
    v = _rand(ks[2], b, s, h, d)
    keep = jax.random.bernoulli(ks[3], 0.6, (b, s)).astype(jnp.float32)
    bias = (keep - 1.0) * (-attn.NEG_BIG)
    out = attn.dot_product_attention(q, k, v, key_bias=bias, use_flash=False)
    ref = attn.dot_product_attention(
        q, k, v, mask=bias[:, None, None, :], use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_fused_cross_attention_parity():
    """Fused q-proj+attn+out-proj kernel vs the unfused chain."""
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    b, n, c, s, h = 2, 512, 128, 77, 4
    hd = c // h
    x = _rand(ks[0], b, n, c)
    wq = _rand(ks[1], c, c) * 0.05
    k = _rand(ks[2], b, s, h, hd)
    v = _rand(ks[3], b, s, h, hd)
    wo = _rand(ks[4], c, c) * 0.05
    bo = _rand(ks[5], c) * 0.05
    scale = hd ** -0.5

    q = (x @ wq).reshape(b, n, h, hd)
    ref_attn = attn._attention_xla(q, k, v, None, None, scale)
    ref = ref_attn.reshape(b, n, c) @ wo + bo

    out = attn.fused_cross_attention(x, wq, k, v, wo, bo, scale, h,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_self_attention_parity():
    """Fused qkv+attn+out self-attention block vs the unfused chain."""
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    b, n, c, h = 2, 512, 128, 4
    hd = c // h
    x = _rand(ks[0], b, n, c)
    wq = _rand(ks[1], c, c) * 0.05
    wk = _rand(ks[2], c, c) * 0.05
    wv = _rand(ks[3], c, c) * 0.05
    wo = _rand(ks[4], c, c) * 0.05
    bo = _rand(ks[5], c) * 0.05
    keep = jax.random.bernoulli(ks[6], 0.8, (b, n)).astype(jnp.float32)
    bias = (keep - 1.0) * (-attn.NEG_BIG)
    scale = hd ** -0.5

    q = (x @ wq).reshape(b, n, h, hd)
    k = (x @ wk).reshape(b, n, h, hd)
    v = (x @ wv).reshape(b, n, h, hd)
    for kb in (None, bias):
        ref_attn = attn._attention_xla(q, k, v, None, kb, scale)
        ref = ref_attn.reshape(b, n, c) @ wo + bo
        out = attn.fused_self_attention(x, wq, wk, wv, wo, bo, scale, h,
                                        key_bias=kb, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("with_bias", [False, True])
def test_flash_nomax_forward_matches_xla(with_bias):
    # serving variant: Cauchy-Schwarz row cap replaces the max pass
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    b, sq, h, d = 2, 512, 2, 40
    q = _rand(ks[0], b, sq, h, d)
    k = _rand(ks[1], b, sq, h, d)
    v = _rand(ks[2], b, sq, h, d)
    bias = None
    if with_bias:
        keep = jax.random.bernoulli(ks[3], 0.7, (b, sq)).astype(jnp.float32)
        bias = (keep - 1.0) * (-attn.NEG_BIG)
    scale = d ** -0.5
    ref = attn._attention_xla(q, k, v, None, bias, scale)
    out, lse = attn._flash_fwd_impl(q, k, v, bias, scale, interpret=True,
                                    nomax=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # the emitted lse must stay EXACT (backward correctness), cap-invariant
    _, lse_exact = attn._flash_fwd_impl(q, k, v, bias, scale, interpret=True,
                                        nomax=False)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_exact),
                               rtol=1e-4, atol=1e-4)


def test_flash_nomax_underflow_guard():
    # a row whose scores all sit far below the cap must yield finite zeros,
    # not NaN: build adversarial q/k with huge norms but negative alignment
    b, sq, h, d = 1, 512, 1, 40
    q = jnp.ones((b, sq, h, d), jnp.float32) * 60.0
    k = -jnp.ones((b, sq, h, d), jnp.float32) * 60.0
    v = jnp.ones((b, sq, h, d), jnp.float32)
    # s = -d*3600*scale ~ -22.7k; cap = +|q||k| ~ +22.7k -> gap >> exp range
    out, _ = attn._flash_fwd_impl(q, k, v, None, d ** -0.5, interpret=True,
                                  nomax=True)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    np.testing.assert_allclose(o, 0.0, atol=1e-20)


@pytest.mark.parametrize("with_bias", [False, True])
def test_flash_exp2_variant_parity(with_bias):
    # log2-domain kernels (env-gated A/B path): forward + VJP must match
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    b, sq, h, d = 1, 512, 2, 40
    q = _rand(ks[0], b, sq, h, d)
    k = _rand(ks[1], b, sq, h, d)
    v = _rand(ks[2], b, sq, h, d)
    bias = None
    if with_bias:
        keep = jax.random.bernoulli(ks[3], 0.8, (b, sq)).astype(jnp.float32)
        bias = (keep - 1.0) * (-attn.NEG_BIG)
    scale = d ** -0.5

    def loss(q, k, v):
        return jnp.sum(attn.flash_attention(q, k, v, bias, scale, True)
                       .astype(jnp.float32) ** 2)

    old = attn._EXP2
    try:
        attn._EXP2 = False
        ref_out = attn.flash_attention(q, k, v, bias, scale, True)
        ref_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        attn._EXP2 = True
        out = attn.flash_attention(q, k, v, bias, scale, True)
        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        attn._EXP2 = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    for a, b_ in zip(g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)
