"""Class-delta token machinery.

Class prompts replace the subject placeholder with a class string (e.g.
"person") that may tokenize to multiple tokens; to keep class prompts
token-aligned with subject prompts, the class-delta tokens are merged into
one embedding and the tail shifted left. Ports of:

  * scan_cls_delta_strings (/root/reference/ldm/util.py:934-997): host-side
    scan of the class half of a compositional batch for the class-delta
    token sequence near the subject position;
  * merge_cls_token_embeddings (ldm/util.py:999-1040): weighted-average the
    M class-delta embeddings into one and shift the remainder left;
  * distribute_embedding_to_M_tokens (ldm/util.py:882-918): spread a
    multi-vector subject's class embedding over its M placeholder slots,
    divided by sqrt(M).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def scan_cls_delta_strings(tokenized_text: np.ndarray, placeholder_bi,
                           placeholder_pos, subj_name_to_cls_delta_tokens: dict,
                           max_search_span: int = 5):
    """Host-side. tokenized_text [B, S]; (placeholder_bi, placeholder_pos):
    first-occurrence subject indices (the first half of the batch). Returns
    [(batch_i, start, M, subj_name), ...] for the class half."""
    if not subj_name_to_cls_delta_tokens:
        return []
    tokenized_text = np.asarray(tokenized_text)
    bs = tokenized_text.shape[0]
    if len(placeholder_bi) == bs:
        return []
    half = bs // 2
    out = []
    for batch_i in range(half, bs):
        row = tokenized_text[batch_i]
        start_index = int(placeholder_pos[batch_i - half])
        found = False
        for j in range(max_search_span + 1):
            start = start_index + j
            for subj_name, toks in subj_name_to_cls_delta_tokens.items():
                toks = np.asarray(toks)
                m = len(toks)
                if start + m <= len(row) and (row[start:start + m] == toks).all():
                    out.append((batch_i, start, m, subj_name))
                    found = True
                    break
            if found:
                break
    return out


def merge_cls_token_embeddings(prompt_embedding: jax.Array,
                               cls_delta_string_indices: list,
                               subj_name_to_cls_delta_token_weights: dict) -> jax.Array:
    """prompt_embedding [B, S, D] (or [B*L, S, D]); indices are host-known
    -> static gather/shift per affected instance (ldm/util.py:999-1040)."""
    if not cls_delta_string_indices:
        return prompt_embedding
    s = prompt_embedding.shape[1]
    cls_delta_string_indices = sorted(cls_delta_string_indices,
                                      key=lambda x: (x[0], x[1]))
    out = prompt_embedding
    batch_i2offset: dict = {}
    for batch_i, start, m, subj_name in cls_delta_string_indices:
        i_off = batch_i2offset.get(batch_i, 0)
        w = jnp.asarray(np.asarray(
            subj_name_to_cls_delta_token_weights[subj_name], np.float32))[:, None]
        cls_embs = prompt_embedding[batch_i, start:start + m]
        avg = jnp.sum(cls_embs * w.astype(cls_embs.dtype), axis=0)
        row = out[batch_i]
        row = row.at[start - i_off].set(avg)
        # shift everything after the delta tokens left by (m-1), except EOS
        seg = prompt_embedding[batch_i, start + m:s - 1]
        row = jax.lax.dynamic_update_slice_in_dim(row, seg, start + 1 - i_off, axis=0)
        out = out.at[batch_i].set(row)
        batch_i2offset[batch_i] = i_off + m - 1
    return out


def distribute_embedding_layerwise(ctx: jax.Array, rows, pos0: jax.Array,
                                   k: int,
                                   divide_scheme: str = "sqrt_M") -> jax.Array:
    """Traced variant of distribute_embedding_to_M_tokens over layerwise
    contexts: ctx [L, B, S, D]; `rows` are the (host-known) batch rows whose
    placeholder starts at traced position pos0[r]; the embedding at pos0 is
    spread over k consecutive slots / sqrt(k) (ldm/util.py:882-918 +
    ddpm.py:2030-2050). Traced positions keep the compiled step reusable
    across prompts whose cls token lands at different offsets."""
    rows = np.asarray(rows)
    m = len(rows)
    L, _, S, D = ctx.shape
    d = {"sqrt_M": np.sqrt(k), "M": float(k), "none": 1.0, None: 1.0}[divide_scheme]
    sel = ctx[:, rows]                                       # [L, m, S, D]
    idx0 = jnp.broadcast_to(pos0.reshape(1, m, 1, 1), (L, m, 1, D))
    col0 = jnp.take_along_axis(sel, idx0, axis=2)            # [L, m, 1, D]
    repl = jnp.broadcast_to(col0 / d, (L, m, k, D))
    li = jnp.broadcast_to(jnp.arange(L)[:, None, None], (L, m, k))
    bi = jnp.broadcast_to(jnp.asarray(rows)[None, :, None], (L, m, k))
    pi = jnp.broadcast_to(pos0[None, :, None] + jnp.arange(k)[None, None],
                          (L, m, k))
    return ctx.at[li, bi, pi].set(repl.astype(ctx.dtype))


def distribute_embedding_to_M_tokens(text_embedding: jax.Array,
                                     placeholder_pos,
                                     divide_scheme: str = "sqrt_M") -> jax.Array:
    """Spread the first placeholder slot's embedding over all M slots / D
    (ldm/util.py:882-918). text_embedding [B, S, D]; placeholder_pos: the M
    token positions (host)."""
    pos = np.unique(np.asarray(placeholder_pos))
    m = len(pos)
    if m <= 1:
        return text_embedding
    d = {"sqrt_M": np.sqrt(m), "M": float(m), "none": 1.0, None: 1.0}[divide_scheme]
    first = text_embedding[:, pos[0]:pos[0] + 1]
    repl = jnp.repeat(first, m, axis=1) / d
    return text_embedding.at[:, pos].set(repl.astype(text_embedding.dtype))
