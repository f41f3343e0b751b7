"""Token merging (ToMe) for the UNet transformer blocks — sampler-path
acceleration.

Implements the ToMe-for-Stable-Diffusion scheme (Bolya & Hoffman 2023,
arXiv:2303.17604): before a transformer block runs at a big spatial
resolution, similar tokens are merged via bipartite soft matching (one
destination token per sy x sx window, sources merged into their most
similar destination), the block's sub-layers run on the reduced token set,
and the output is unmerged (merged sources copy their destination's
output) before the residual add. At 64x64 latents the 4096-token
self-attention is quadratic in tokens, so a 0.5 merge ratio cuts it ~4x.

No reference counterpart (/root/reference serves exact fp16 DDIM); this is
an opt-in deployment-path speedup for BASELINE.md's 4 img/s north star —
docs/PERF.md shows the exact-math roofline on this chip makes the target
unreachable without algorithmic reduction. Defaults keep it OFF; quality
impact at ratio <= 0.5 is small in the published ablations but MUST be
re-validated on real checkpoints before production use.

TPU-first design choices vs the CUDA original:
  * static shapes: the merge count r is quantized so the reduced token
    count stays a multiple of 256 (flash-attention block alignment);
  * the scatter-mean of merged sources into destinations runs as a
    one-hot MXU matmul (with a ones column for the counts) instead of a
    serialized scatter-add;
  * destinations are the fixed (0,0) corner of each window rather than
    randomly drawn per call — keeps the sampler graph deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def quantize_merge_count(n: int, ratio: float, n_src: int,
                         multiple: int = 256) -> int:
    """Largest r <= ratio*n with (n - r) % multiple == 0 and r <= n_src."""
    r = min(int(n * ratio), n_src)
    keep = n - r
    keep = -(-keep // multiple) * multiple  # round keep UP -> r down
    return max(n - keep, 0)


@functools.lru_cache(maxsize=32)
def _partition(h: int, w: int, sy: int, sx: int):
    """Static src/dst token index split for an h x w row-major grid.

    dst = the (0,0) corner of every sy x sx window; src = the rest.
    Returns (src_idx [Ns], dst_idx [Nd], inv_perm [N]) as numpy arrays,
    where inv_perm scatters concat(src, dst) back to token order.
    """
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    is_dst = ((yy % sy == 0) & (xx % sx == 0)).reshape(-1)
    tok = np.arange(h * w)
    src_idx = tok[~is_dst]
    dst_idx = tok[is_dst]
    perm = np.concatenate([src_idx, dst_idx])
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(h * w)
    return src_idx, dst_idx, inv_perm


def build_merge(x: jax.Array, h: int, w: int, ratio: float,
                sy: int = 2, sx: int = 2, align: int = 256):
    """Build (merge, unmerge) closures from block-input features.

    Args:
      x: [B, N, C] token features (N == h*w) used as the similarity metric
        (cosine). Gradients do not flow through the matching
        (sampler-only path; indices are data-dependent values).
      ratio: fraction of ALL tokens to merge away (ToMe-SD convention);
        quantized down so the kept count is a multiple of `align`.

    Returns (merge, unmerge, n_kept):
      merge(t [B, N, C]) -> [B, n_kept, C]   (unmerged srcs then dsts)
      unmerge(t [B, n_kept, C]) -> [B, N, C]
    """
    b, n, c = x.shape
    assert n == h * w, (n, h, w)
    src_idx, dst_idx, inv_perm = _partition(h, w, sy, sx)
    ns, nd = len(src_idx), len(dst_idx)
    r = quantize_merge_count(n, ratio, ns, align)
    if r <= 0:
        return (lambda t: t), (lambda t: t), n
    n_kept = n - r

    metric = jax.lax.stop_gradient(x).astype(jnp.float32)
    metric = metric / (jnp.linalg.norm(metric, axis=-1, keepdims=True) + 1e-6)
    a = metric[:, src_idx]                     # [B, Ns, C]
    bm = metric[:, dst_idx]                    # [B, Nd, C]
    scores = jnp.einsum("bsc,bdc->bsd", a, bm)  # [B, Ns, Nd]
    node_max = jnp.max(scores, axis=-1)        # [B, Ns]
    node_idx = jnp.argmax(scores, axis=-1)     # [B, Ns] dst assignment

    # most-similar srcs get merged; order[:, :r] merged, order[:, r:] kept
    order = jnp.argsort(-node_max, axis=-1)    # [B, Ns]
    merged_pos = order[:, :r]                  # positions into src list
    kept_pos = order[:, r:]
    d_assign = jnp.take_along_axis(node_idx, merged_pos, axis=1)  # [B, r]
    # one-hot [B, Nd, r] for the scatter-mean matmul (see module docstring)
    onehot = (d_assign[:, None, :] == jnp.arange(nd)[None, :, None])

    batch_ix = jnp.arange(b)[:, None]

    def merge(t: jax.Array) -> jax.Array:
        src_t = t[:, src_idx]
        dst_t = t[:, dst_idx]
        unm = src_t[batch_ix, kept_pos]                      # [B, Ns-r, C]
        mrg = src_t[batch_ix, merged_pos]                    # [B, r, C]
        # sums and counts in one MXU matmul: append a ones column to mrg
        mrg1 = jnp.concatenate(
            [mrg.astype(jnp.float32), jnp.ones((b, r, 1), jnp.float32)], -1)
        acc = jnp.einsum("bdr,brc->bdc", onehot.astype(jnp.float32), mrg1)
        dst_new = ((dst_t.astype(jnp.float32) + acc[..., :-1])
                   / (1.0 + acc[..., -1:])).astype(t.dtype)
        return jnp.concatenate([unm, dst_new], axis=1)       # [B, n_kept, C]

    def unmerge(t: jax.Array) -> jax.Array:
        unm_t = t[:, :ns - r]
        dst_t = t[:, ns - r:]
        mrg_out = dst_t[batch_ix, d_assign]                  # [B, r, C]
        # src outputs in `order` order -> undo the sort, then undo the
        # src/dst partition (static permutation)
        src_sorted = jnp.concatenate([mrg_out, unm_t], axis=1)
        inv_order = jnp.argsort(order, axis=-1)
        src_out = src_sorted[batch_ix, inv_order]            # [B, Ns, C]
        full = jnp.concatenate([src_out, dst_t], axis=1)
        return full[:, inv_perm]

    return merge, unmerge, n_kept
