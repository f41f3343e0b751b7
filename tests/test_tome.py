"""Token-merging (ops/tome.py) unit tests — pure JAX, CPU-runnable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaprompt_tpu.ops import tome


def _ref_merge_unmerge(x, t, h, w, ratio, sy=2, sx=2, align=256):
    """Straight-line numpy oracle of the bipartite soft matching."""
    b, n, c = x.shape
    src_idx, dst_idx, _ = tome._partition(h, w, sy, sx)
    ns, nd = len(src_idx), len(dst_idx)
    r = tome.quantize_merge_count(n, ratio, ns, align)
    metric = x.astype(np.float64)
    metric = metric / (np.linalg.norm(metric, axis=-1, keepdims=True) + 1e-6)
    merged_list, unmerged_list = [], []
    for bi in range(b):
        scores = metric[bi, src_idx] @ metric[bi, dst_idx].T
        node_max = scores.max(-1)
        node_idx = scores.argmax(-1)
        order = np.argsort(-node_max, kind="stable")
        merged_pos, kept_pos = order[:r], order[r:]
        src_t = t[bi, src_idx]
        dst_t = t[bi, dst_idx].astype(np.float64).copy()
        counts = np.ones(nd)
        for p in merged_pos:
            d = node_idx[p]
            dst_t[d] += src_t[p]
            counts[d] += 1
        dst_t /= counts[:, None]
        merged = np.concatenate([src_t[kept_pos], dst_t], axis=0)
        merged_list.append(merged)
        # unmerge(merge(t)): kept srcs keep their value; merged srcs copy
        # their dst's merged value; dsts keep merged values
        out = np.empty((n, c))
        out[dst_idx] = dst_t
        out[src_idx[kept_pos]] = src_t[kept_pos]
        for p in merged_pos:
            out[src_idx[p]] = dst_t[node_idx[p]]
        unmerged_list.append(out)
    return np.stack(merged_list), np.stack(unmerged_list), r


def test_quantize_merge_count():
    # 64x64: N=4096, Ns=3072; ratio .5 -> r=2048, kept 2048 (mult of 256)
    assert tome.quantize_merge_count(4096, 0.5, 3072) == 2048
    # awkward ratio rounds the KEPT count up
    r = tome.quantize_merge_count(4096, 0.4, 3072)
    assert (4096 - r) % 256 == 0 and r <= int(4096 * 0.4)
    # ratio too big is clamped by the src count
    assert tome.quantize_merge_count(4096, 0.9, 3072) <= 3072
    assert tome.quantize_merge_count(4096, 0.0, 3072) == 0


def test_partition_covers_all_tokens():
    src, dst, inv = tome._partition(8, 8, 2, 2)
    assert len(dst) == 16 and len(src) == 48
    assert sorted(np.concatenate([src, dst]).tolist()) == list(range(64))
    perm = np.concatenate([src, dst])
    assert (perm[inv] == np.arange(64)).all()


@pytest.mark.parametrize("ratio,align", [(0.5, 16), (0.4, 16)])
def test_merge_unmerge_match_numpy_oracle(ratio, align):
    h = w = 8
    b, c = 2, 12
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h * w, c), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(1), (b, h * w, c), jnp.float32)

    merge, unmerge, n_kept = tome.build_merge(x, h, w, ratio, align=align)
    got_m = np.asarray(merge(t))
    got_u = np.asarray(unmerge(merge(t)))
    ref_m, ref_u, r = _ref_merge_unmerge(np.asarray(x), np.asarray(t), h, w,
                                         ratio, align=align)
    assert n_kept == h * w - r
    assert got_m.shape == (b, n_kept, c)
    np.testing.assert_allclose(got_m, ref_m, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_u, ref_u, rtol=1e-5, atol=1e-5)


def test_zero_ratio_is_identity():
    x = jnp.ones((1, 64, 4))
    merge, unmerge, n_kept = tome.build_merge(x, 8, 8, 0.0)
    assert n_kept == 64
    t = jnp.arange(64 * 4, dtype=jnp.float32).reshape(1, 64, 4)
    np.testing.assert_array_equal(np.asarray(merge(t)), np.asarray(t))
    np.testing.assert_array_equal(np.asarray(unmerge(t)), np.asarray(t))


def test_jit_and_constant_field_is_preserved():
    """Merging identical tokens then unmerging reproduces them exactly, and
    the whole thing traces under jit with static shapes."""
    h = w = 16
    b, c = 3, 8

    @jax.jit
    def roundtrip(x):
        merge, unmerge, _ = tome.build_merge(x, h, w, 0.5, align=16)
        return unmerge(merge(x))

    x = jnp.broadcast_to(jnp.arange(c, dtype=jnp.float32), (b, h * w, c))
    # add batch-distinct constant offsets: all tokens within a batch equal
    x = x + jnp.arange(b, dtype=jnp.float32)[:, None, None]
    out = roundtrip(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
