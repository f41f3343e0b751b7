"""Compel-style CFG prompt weighting.

Port of prob_apply_compel_cfg (/root/reference/ldm/util.py:1825-1857): push
the conditioning embeddings away from the empty-prompt embeddings by
1.1**level (the compel library's attention-weight convention), optionally
per-instance (batch_mask) and sparing specific token positions. The
stochastic gating (probability, level sampling) is host-side — pass the
resolved level.

Disabled under zero-shot in the reference config (yaml:52-54); provided for
the non-zero-shot training mode and for inference-time prompt weighting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_compel_cfg(context: jax.Array, empty_context: jax.Array,
                     weight_level: float,
                     skipped_token_pos=None,
                     batch_mask: jax.Array | None = None) -> jax.Array:
    """context [..., B, S, D]; empty_context broadcastable; weight_level w:
    out = (ctx - empty) * 1.1**w + empty."""
    weight = 1.1 ** weight_level
    out = (context - empty_context) * weight + empty_context
    if skipped_token_pos is not None:
        pos = jnp.asarray(skipped_token_pos)
        out = out.at[..., pos, :].set(context[..., pos, :])
    if batch_mask is not None:
        m = batch_mask.reshape((-1, 1, 1)).astype(context.dtype)
        out = out * m + context * (1.0 - m)
    return out
