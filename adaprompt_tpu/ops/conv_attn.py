"""Convolutional subject-token attention.

Port of replace_rows_by_conv_attn (/root/reference/ldm/util.py:700-881): for
the ks*ks subject embeddings, the pointwise q.k attention column is replaced
by a *convolutional* attention — the subject embeddings arranged as a
ks x ks grouped conv kernel slid over the (per-head) q feature map, each
embedding receiving a spatially shifted copy of the conv response (so the M
embeddings attend to M neighboring spatial offsets).

Re-architecture: the reference loops over instances in Python and mutates
the attention matrix in place; here one vmapped grouped convolution computes
all instances, and the columns are scattered functionally. Positions are
traced arrays (no recompile across prompts).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_PADS = {2: (0, 1, 0, 1), 3: (1, 1, 1, 1), 4: (1, 2, 1, 2)}  # l, r, t, b


def replace_rows_by_conv_attn(attn_mat: jax.Array, q: jax.Array, k: jax.Array,
                              subj_pos: jax.Array, infeat_size: tuple,
                              conv_attn_kernel_size: int, sim_scale: float,
                              conv_attn_mix_weight: float = 1.0,
                              shift_attn_maps_for_diff_embs: bool = True) -> jax.Array:
    """attn_mat: [B, H, N, T] pre-softmax scores; q: [B, H, N, C];
    k: [B, H, T, C]; subj_pos: [BS, M] token positions of the M subject
    embeddings for the first BS instances (M >= ks*ks; the first ks*ks are
    used). infeat_size: (h, w) with h*w == N.

    Returns the updated attention scores (same shape).
    """
    ks = conv_attn_kernel_size
    if ks == 1:
        return attn_mat
    pads = _PADS[ks]
    h, w = infeat_size
    b, H, n, t = attn_mat.shape
    c = q.shape[-1]
    subj_pos = jnp.asarray(subj_pos)
    bs, m = subj_pos.shape
    k2 = ks * ks
    norm = ks ** 1.5

    def per_instance(q_i, k_i, pos_i):
        # q_i: [H, N, C] -> feature map [1, h, w, H*C] (NHWC)
        qmap = q_i.transpose(1, 0, 2).reshape(1, h, w, H * c)
        qmap = jnp.pad(qmap, ((0, 0), (pads[2], pads[3]), (pads[0], pads[1]), (0, 0)))
        # conv weight from the first ks^2 subject embeddings:
        # k_i[:, pos, :] -> [H, C, ks, ks] -> HWIO [ks, ks, C, H] grouped
        subj_k = k_i[:, pos_i[:k2], :]            # [H, ks2, C]
        wgt = subj_k.transpose(0, 2, 1).reshape(H, c, ks, ks)
        wgt_hwio = wgt.transpose(2, 3, 1, 0)      # [ks, ks, C, H]
        out = jax.lax.conv_general_dilated(
            qmap, wgt_hwio, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=H)                # [1, h, w, H]
        sa = out[0].transpose(2, 0, 1) * (sim_scale / norm)   # [H, h, w]

        if shift_attn_maps_for_diff_embs:
            maps = []
            for dy in range(-pads[2], pads[3] + 1):
                for dx in range(-pads[0], pads[1] + 1):
                    shifted = jnp.roll(sa, (dy, dx), axis=(1, 2))
                    # zero the wrapped-around borders (F.pad semantics)
                    if dy > 0:
                        shifted = shifted.at[:, :dy, :].set(0.0)
                    elif dy < 0:
                        shifted = shifted.at[:, dy:, :].set(0.0)
                    if dx > 0:
                        shifted = shifted.at[:, :, :dx].set(0.0)
                    elif dx < 0:
                        shifted = shifted.at[:, :, dx:].set(0.0)
                    maps.append(shifted)
            sa_all = jnp.stack(maps, axis=0)        # [ks2, H, h, w]
        else:
            sa_all = jnp.broadcast_to(sa[None], (k2,) + sa.shape)
        return sa_all.reshape(k2, H, n)             # [ks2, H, N]

    conv_attn = jax.vmap(per_instance)(q[:bs], k[:bs], subj_pos)  # [BS, ks2, H, N]

    # scatter into the attention columns pos_i[:ks2] of the first BS rows
    bi = jnp.broadcast_to(jnp.arange(bs)[:, None], (bs, k2))
    pi = subj_pos[:, :k2]
    old = attn_mat[bi, :, :, pi]                     # [BS, ks2, H, N]
    new = old * (1.0 - conv_attn_mix_weight) + conv_attn * conv_attn_mix_weight
    return attn_mat.at[bi, :, :, pi].set(new.astype(attn_mat.dtype))
