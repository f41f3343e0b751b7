"""Exponential moving average of trainable params.

Port of /root/reference/ldm/modules/ema.py (LitEma):
decay_t = min(decay, (1 + n) / (10 + n)); shadow <- shadow - (1-decay_t) *
(shadow - param). Present-but-off in the reference configs (use_ema: False),
kept here for completeness.
"""

from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any
    num_updates: jax.Array


def ema_init(params, use_num_updates: bool = True) -> EmaState:
    return EmaState(shadow=jax.tree.map(jnp.asarray, params),
                    num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32))


def ema_update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    # LitEma increments num_updates BEFORE computing the decay
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, state.num_updates)
    d = jnp.where(n >= 0,
                  jnp.minimum(decay, (1.0 + n) / (10.0 + n)),
                  decay)
    new_shadow = jax.tree.map(
        lambda s, p: s - (1.0 - d) * (s - p.astype(s.dtype)), state.shadow, params)
    return EmaState(shadow=new_shadow, num_updates=n)


def ema_copy_to(state: EmaState):
    """Return the shadow params (copy_to semantics)."""
    return state.shadow
