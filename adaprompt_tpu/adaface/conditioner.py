"""PromptConditioner — the reference EmbeddingManager's text-conditioning
role as explicit data flow.

The reference entangles tokenizer, text encoder, and mutable state: a
monkey-patched CLIP embeddings forward calls EmbeddingManager.forward, which
repeats the prompt 16x along the batch dim, splices per-layer subject
embeddings at placeholder indices, and stashes index bookkeeping on self
(/root/reference/ldm/modules/embedding_manager.py:1292-1562, 1699-1722;
ldm/modules/encoders/modules.py:195-230).

Here the same computation is one pure function:

    tokenize (host) -> find placeholder indices (host, numpy)
    -> token_embed -> splice subject vectors -> CLIP encode (batched over
       the 16 layers when per-layer embeddings differ) -> [L, B, 77, 768]

plus the training-time embedding-noise injection
(anneal_add_noise_to_embedding, embedding_manager.py:1531-1541) driven by an
explicit PRNG key.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.models import clip_text
from adaprompt_tpu.utils.tokenizer import CLIPTokenizer


@dataclasses.dataclass(frozen=True)
class PlaceholderSpec:
    string: str            # e.g. 'z' (subject), 'y' (background)
    token_id: int
    num_vectors: int       # K vectors spliced starting at the placeholder
    is_bg: bool = False


def make_placeholders(tokenizer: CLIPTokenizer,
                      subject_strings=("z",), background_strings=("y",),
                      num_vectors_subj: int = 16, num_vectors_bg: int = 4):
    """Register placeholder strings as added tokens and build specs
    (embedding_manager.py:1118-1138 + extend_clip_text_embedder)."""
    def token_for(s):
        # the reference's get_clip_tokens_for_string(force_single_token=True):
        # the placeholder must tokenize to ONE token; add it when it doesn't.
        ids = tokenizer.encode_raw(s)
        if len(ids) == 1:
            return ids[0]
        tokenizer.add_tokens([s])
        return tokenizer.convert_tokens_to_ids([s])[0]

    specs = [PlaceholderSpec(s, token_for(s), num_vectors_subj, is_bg=False)
             for s in subject_strings]
    specs += [PlaceholderSpec(s, token_for(s), num_vectors_bg, is_bg=True)
              for s in background_strings or ()]
    return specs


def find_placeholder_indices(token_ids: np.ndarray, spec: PlaceholderSpec):
    """First occurrence of the placeholder per prompt (extra occurrences are
    background, embedding_manager.py:1367-1371).

    Returns (batch_idx [M], pos [M]) numpy arrays; M = #prompts containing it.
    """
    b_idx, positions = [], []
    for i, row in enumerate(np.asarray(token_ids)):
        hits = np.where(row == spec.token_id)[0]
        if len(hits):
            b_idx.append(i)
            positions.append(int(hits[0]))
    return np.asarray(b_idx, np.int32), np.asarray(positions, np.int32)


def splice_subject_embeddings(token_embs: jax.Array, subj_embs: jax.Array,
                              batch_idx, positions,
                              num_vectors: int) -> jax.Array:
    """Write K subject vectors into per-layer token embeddings.

    token_embs: [L, B, S, D] (L=16 layerwise or 1)
    subj_embs:  [M, L', K, D] with L' in {1, L}; row m targets prompt
                batch_idx[m] at positions[m]..positions[m]+K-1.
    batch_idx/positions may be traced arrays (dynamic per batch — no
    recompilation) as long as M is fixed.
    """
    L = token_embs.shape[0]
    batch_idx = jnp.asarray(batch_idx)
    positions = jnp.asarray(positions)
    m = batch_idx.shape[0]
    if m == 0:
        return token_embs
    if subj_embs.shape[1] != L:
        subj_embs = jnp.broadcast_to(subj_embs,
                                     (m, L) + subj_embs.shape[2:])
    k_off = jnp.arange(num_vectors)
    # scatter indices: [L, M, K]
    li = jnp.broadcast_to(jnp.arange(L)[:, None, None], (L, m, num_vectors))
    bi = jnp.broadcast_to(batch_idx[None, :, None], (L, m, num_vectors))
    pi = jnp.broadcast_to(positions[None, :, None] + k_off[None, None], (L, m, num_vectors))
    vals = subj_embs[:, :, :num_vectors].transpose(1, 0, 2, 3)  # [L, M, K, D]
    return token_embs.at[li, bi, pi].set(vals.astype(token_embs.dtype))


def encode_spliced(text_params: dict, ids: jax.Array, subj_splices: list,
                   skip_weights: jax.Array, num_ca_layers: int,
                   text_cfg: clip_text.CLIPTextConfig,
                   layerwise: bool = False) -> jax.Array:
    """Pure jittable path of PromptConditioner: token-embed `ids` [B, S],
    apply each (subj_embs [M,L',K,D], batch_idx [M], positions [M], K)
    splice, CLIP-encode with clip-skip -> [L, B, S, D]."""
    b = ids.shape[0]
    L = num_ca_layers if (layerwise or any(s[0].shape[1] > 1 for s in subj_splices)) else 1
    token_embs = clip_text.token_embed(text_params, ids)
    token_embs = jnp.broadcast_to(token_embs[None], (L,) + token_embs.shape)
    for subj_embs, bi, pos, k in subj_splices:
        token_embs = splice_subject_embeddings(token_embs, subj_embs, bi, pos, k)
    lb = token_embs.reshape(L * b, *token_embs.shape[2:])
    ids_rep = jnp.tile(ids, (L, 1))
    enc = clip_text.encode(text_params, ids_rep, cfg=text_cfg,
                           inputs_embeds=lb, hidden_state_layer_weights=skip_weights)
    return enc.reshape(L, b, *enc.shape[1:])


def add_noise_to_tensor(ts: jax.Array, key: jax.Array,
                        noise_std: jax.Array) -> jax.Array:
    """Relative-std gaussian noise (adaface/util.py:9-24,
    noise_std_is_relative=True, keep_norm=False). `noise_std` is a traced
    scalar — pass 0 to disable (the train loop samples the on/off coin and
    the U(0.02, 0.04) std host-side, embedding_manager.py:1531-1541 +
    yaml:98-103)."""
    rel = jax.lax.stop_gradient(jnp.std(ts, axis=-1).mean())
    noise = jax.random.normal(key, ts.shape, ts.dtype)
    return ts + noise * (jnp.asarray(noise_std, ts.dtype) * rel)


def add_noise_to_embedding(embs: jax.Array, key: jax.Array, noise_std_range,
                           training_percent: float, prob_mask: jax.Array) -> jax.Array:
    """Annealed relative-noise injection on subject embeddings
    (anneal_add_noise_to_embedding -> add_noise_to_tensor,
    embedding_manager.py:1531-1541, adaface/util.py:9-24). `prob_mask`
    ([M] 0/1) selects which occurrences get noise (sampled host-side)."""
    lo, hi = noise_std_range
    std = lo + (hi - lo) * training_percent
    rel = jnp.std(embs, axis=-1).mean()
    noise = jax.random.normal(key, embs.shape, embs.dtype) * (std * rel)
    shape = (-1,) + (1,) * (embs.ndim - 1)
    return embs + noise * prob_mask.reshape(shape).astype(embs.dtype)


class PromptConditioner:
    """Host-orchestrated prompt conditioning with a jitted device path."""

    def __init__(self, text_params: dict, tokenizer: CLIPTokenizer,
                 placeholders: list[PlaceholderSpec],
                 text_cfg: clip_text.CLIPTextConfig = clip_text.SD15_TEXT_CONFIG,
                 num_ca_layers: int = 16):
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.placeholders = {p.string: p for p in placeholders}
        self.text_cfg = text_cfg
        self.num_ca_layers = num_ca_layers

    def tokenize(self, prompts) -> np.ndarray:
        return self.tokenizer(prompts, max_length=self.text_cfg.max_positions)

    def __call__(self, prompts, subj_embs_by_placeholder: dict | None = None,
                 skip_weights=(1.0, 1.0), layerwise: bool | None = None) -> jax.Array:
        """prompts + {placeholder: [M, L', K, D] subject embeddings}
        -> context [L, B, 77, 768] (L = num_ca_layers if any per-layer
        embeddings differ or layerwise=True, else 1)."""
        ids_np = self.tokenize(prompts)
        b = ids_np.shape[0]
        subj_embs_by_placeholder = subj_embs_by_placeholder or {}

        if layerwise is None:
            layerwise = any(e.shape[1] > 1 for e in subj_embs_by_placeholder.values())
        L = self.num_ca_layers if layerwise else 1

        ids = jnp.asarray(ids_np)
        token_embs = clip_text.token_embed(self.text_params, ids)  # [B,S,D]
        token_embs = jnp.broadcast_to(token_embs[None], (L,) + token_embs.shape)

        for name, embs in subj_embs_by_placeholder.items():
            spec = self.placeholders[name]
            bi, pos = find_placeholder_indices(ids_np, spec)
            if len(bi) == 0:
                continue
            if embs.shape[0] == 1 and len(bi) > 1:
                embs = jnp.broadcast_to(embs, (len(bi),) + embs.shape[1:])
            elif embs.shape[0] < len(bi):
                reps = len(bi) // embs.shape[0]
                embs = jnp.tile(embs, (reps, 1, 1, 1))
            token_embs = splice_subject_embeddings(token_embs, embs, bi, pos,
                                                   spec.num_vectors)

        # batched encode over (L*B); positions/causality depend only on S
        lb = token_embs.reshape(L * b, *token_embs.shape[2:])
        ids_rep = jnp.tile(ids, (L, 1))
        sw = jnp.asarray(np.asarray(skip_weights, np.float32))
        enc = clip_text.encode(self.text_params, ids_rep, cfg=self.text_cfg,
                               inputs_embeds=lb, hidden_state_layer_weights=sw)
        return enc.reshape(L, b, *enc.shape[1:])
