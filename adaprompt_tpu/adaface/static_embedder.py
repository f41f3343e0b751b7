"""StaticLayerwiseEmbedding — the legacy (non-zero-shot) textual-inversion
embedder.

Port of /root/reference/ldm/modules/embedding_manager.py:362-539: per
placeholder, 16 layerwise embeddings of K vectors are generated as
LoRA-style combinations of r basis vectors,

    out[l, k] = LN(  (basis_rand_w[l,k] + basis_comm_w[0,k]) @ basis_vecs[k]
                  ) / sqrt(D) + bias[l, k]

where the first N basis vectors may be initialized from init-word embeddings
(pre_vecs). In zero-shot mode the reference reduces this module to a reshape
pass-through of the SubjBasisGenerator output (502-516) — our conditioner
consumes [B, L, K, D] directly, so only the legacy math lives here.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.ops.layers import layer_norm


@dataclasses.dataclass(frozen=True)
class StaticEmbedderConfig:
    num_layers: int = 16
    num_vectors: int = 1          # K
    out_emb_dim: int = 768
    rank: int = 6                 # r
    num_init_vecs: int = 0        # N (leading basis vectors from init words)
    has_bias: bool = True


def init_params(key: jax.Array, cfg: StaticEmbedderConfig,
                init_vecs: jax.Array | None = None,
                init_vec_weights=None,
                init_noise_stds=(0.1, 0.04), dtype=jnp.float32) -> dict:
    """Mirrors the reference initialization (embedding_manager.py:405-489)."""
    k1, k2 = jax.random.split(key)
    L, K, r, D = cfg.num_layers, cfg.num_vectors, cfg.rank, cfg.out_emb_dim
    n = 0 if init_vecs is None else init_vecs.shape[0]

    basis_rand = jax.random.normal(k1, (L, K, r), dtype)
    basis_comm = jnp.full((1, K, r), 1.0 / r, dtype)
    pre_vecs = None
    if init_vecs is not None:
        pre_vecs = jnp.tile(jnp.asarray(init_vecs, dtype)[None], (K, 1, 1))
        basis_comm = jnp.full((1, K, r), 1.0 / n, dtype)
        basis_comm = basis_comm.at[:, :, n:].multiply(0.4)
        if init_vec_weights is not None:
            w = jnp.asarray(np.asarray(init_vec_weights, np.float32))
            basis_comm = basis_comm.at[:, :, :n].set(w[None, None])
        basis_rand = basis_rand.at[:, :, :n].multiply(init_noise_stds[1])
        basis_rand = basis_rand.at[:, :, n:].multiply(init_noise_stds[0])

    basis_vecs = jax.random.normal(k2, (K, r - n, D), dtype)
    basis_vecs = basis_vecs / jnp.linalg.norm(basis_vecs, axis=-1, keepdims=True) / 4.0
    basis_vecs = basis_vecs.at[-1].set(0.0)

    p = {"basis_rand_weights": basis_rand, "basis_comm_weights": basis_comm,
         "basis_vecs": basis_vecs}
    if pre_vecs is not None:
        p["pre_vecs"] = pre_vecs
    if cfg.has_bias:
        p["bias"] = jnp.zeros((L, K, D), dtype)
    return p


def from_torch(state_dict, cfg: StaticEmbedderConfig, dtype=jnp.float32) -> dict:
    sd = {k: (v.detach().float().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    p = {"basis_rand_weights": jnp.asarray(sd["basis_rand_weights"], dtype),
         "basis_comm_weights": jnp.asarray(sd["basis_comm_weights"], dtype),
         "basis_vecs": jnp.asarray(sd["basis_vecs"], dtype)}
    if "pre_vecs" in sd:
        p["pre_vecs"] = jnp.asarray(sd["pre_vecs"], dtype)
    if "bias" in sd:
        p["bias"] = jnp.asarray(sd["bias"], dtype)
    return p


def forward(params: dict, cfg: StaticEmbedderConfig) -> jax.Array:
    """-> [num_layers, K, D] static layerwise embeddings
    (embedding_manager.py:505-539)."""
    weights = params["basis_rand_weights"] + params["basis_comm_weights"]  # [L,K,r]
    if "pre_vecs" in params:
        basis = jnp.concatenate([params["pre_vecs"], params["basis_vecs"]], axis=1)
    else:
        basis = params["basis_vecs"]                                        # [K,r,D]
    # per-k matmul: [L, r]_k @ [r, D]_k
    out = jnp.einsum("lkr,krd->lkd", weights, basis)
    out = layer_norm(out, None, None)          # non-affine LN per (l, k)
    out = out / np.sqrt(cfg.out_emb_dim)
    if "bias" in params:
        out = out + params["bias"]
    return out
