"""Arc2Face forward / inverse prompt-embedding functions.

TPU-native re-implementation of /root/reference/adaface/util.py:76-238:

  * `forward_face_embs`: embed a normalized ArcFace vector into the Arc2Face
    CLIP prompt space — tokenize "photo of a id person", replace the 'id'
    token embedding with the zero-padded 512-d face vector, run the Arc2Face
    text encoder, return the full [B,77,768] embeddings and the 16 "core"
    ID embeddings (positions id..id+15).
  * `inverse_face_prompt_embs`: map Arc2Face core embeddings back into SD's
    prompt space — template "photo of a " + ", "*16 (+<=2 extra words),
    splice the 16 core embeddings over the 16 ',' placeholders, run the
    (retrained) `prompt2token_proj` CLIP encoder with learnable last-3-layer
    weights, return the requested embedding variants
    (full / full_pad / full_half_pad / full_zeroed_extra / core / b_core_e).

Unlike the reference, placeholder positions are computed from the tokenizer
instead of hardcoding 4:20, so the functions work with any vocabulary
(including the asset-free fallback tokenizer). With the real CLIP vocab the
positions are exactly 4..19.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.models import clip_text
from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

NUM_CORE_EMBS = 16
EXTRA_WORDS_MAX_TOKENS = 2


@functools.lru_cache(maxsize=8)
def _forward_template(tok_key: int, max_length: int):
    """(ids [S], id_pos) for 'photo of a id person'."""
    tok = _TOKENIZERS[tok_key]
    id_tok = tok.encode_raw("id")
    assert len(id_tok) >= 1
    ids = tok("photo of a id person", max_length=max_length)[0]
    pos = int(np.where(ids == id_tok[0])[0][0])
    return ids, pos


@functools.lru_cache(maxsize=64)
def _inverse_template(tok_key: int, max_length: int, extra_words: str | None):
    """(ids [S], first comma position) for 'photo of a ' + ', '*16 [+extra]."""
    tok = _TOKENIZERS[tok_key]
    comma_ids = tok.encode_raw(",")
    assert len(comma_ids) == 1, "',' must be a single token"
    text = "photo of a " + ", " * NUM_CORE_EMBS + (extra_words or "")
    ids = tok(text, max_length=max_length)[0]
    comma_pos = np.where(ids == comma_ids[0])[0]
    assert len(comma_pos) >= NUM_CORE_EMBS
    start = int(comma_pos[0])
    # the 16 placeholders must be consecutive
    assert (comma_pos[:NUM_CORE_EMBS] == np.arange(start, start + NUM_CORE_EMBS)).all()
    return ids, start


# tokenizers aren't hashable for lru_cache; register by id
_TOKENIZERS: dict[int, CLIPTokenizer] = {}


def _tok_key(tok: CLIPTokenizer) -> int:
    k = id(tok)
    _TOKENIZERS[k] = tok
    return k


def forward_face_embs(text_params: dict, tokenizer: CLIPTokenizer,
                      face_embs: jax.Array, *,
                      text_cfg: clip_text.CLIPTextConfig = clip_text.SD15_TEXT_CONFIG,
                      input_max_length: int = 77,
                      return_full_and_core: bool = True):
    """ArcFace [B,512] -> Arc2Face prompt embeddings.

    Mirrors arc2face_forward_face_embs (adaface/util.py:76-125).
    """
    ids_np, id_pos = _forward_template(_tok_key(tokenizer), input_max_length)
    b = face_embs.shape[0]
    ids = jnp.tile(jnp.asarray(ids_np)[None], (b, 1))

    token_embs = clip_text.token_embed(text_params, ids)
    face_padded = jnp.pad(face_embs.astype(token_embs.dtype),
                          ((0, 0), (0, text_cfg.hidden_size - face_embs.shape[-1])))
    token_embs = token_embs.at[:, id_pos].set(face_padded)

    prompt_embs = clip_text.encode(text_params, ids, cfg=text_cfg,
                                   inputs_embeds=token_embs)
    core = jax.lax.dynamic_slice_in_dim(prompt_embs, id_pos, NUM_CORE_EMBS, axis=1)
    if return_full_and_core:
        return prompt_embs, core
    return core


def inverse_face_prompt_embs(text_params: dict, tokenizer: CLIPTokenizer,
                             face_prompt_embs: jax.Array,
                             return_emb_types: tuple,
                             pad_embeddings: jax.Array,
                             *,
                             hidden_state_layer_weights: jax.Array | None = None,
                             list_extra_words: list | None = None,
                             zs_extra_words_scale: float = 0.5,
                             input_max_length: int = 77,
                             text_cfg: clip_text.CLIPTextConfig = clip_text.SD15_TEXT_CONFIG):
    """Arc2Face core embeddings [B,16,768] -> SD prompt-space embeddings.

    Mirrors arc2face_inverse_face_prompt_embs (adaface/util.py:132-238).
    return_emb_types: tuple of
      'full' | 'full_pad' | 'full_half_pad' | 'full_zeroed_extra' | 'core' |
      'b_core_e'.
    pad_embeddings: [77,768] position-aware pad-token embeddings
      (SubjBasisGenerator.generate_pad_embeddings).
    """
    b = face_prompt_embs.shape[0]
    if list_extra_words is not None:
        assert len(list_extra_words) == b, (len(list_extra_words), b)
        for w in list_extra_words:
            assert len(w.split()) <= 2
        rows, starts = [], []
        for w in list_extra_words:
            ids_np, start = _inverse_template(_tok_key(tokenizer), input_max_length, w)
            rows.append(ids_np)
            starts.append(start)
        assert len(set(starts)) == 1
        ids_np = np.stack(rows)
        start = starts[0]
        ids = jnp.asarray(ids_np)
    else:
        ids_np, start = _inverse_template(_tok_key(tokenizer), input_max_length, None)
        ids = jnp.tile(jnp.asarray(ids_np)[None], (b, 1))

    token_embs = clip_text.token_embed(text_params, ids)
    token_embs = jax.lax.dynamic_update_slice_in_dim(
        token_embs, face_prompt_embs.astype(token_embs.dtype), start, axis=1)

    prompt_embs = clip_text.encode(
        text_params, ids, cfg=text_cfg, inputs_embeds=token_embs,
        hidden_state_layer_weights=hidden_state_layer_weights)

    core = jax.lax.dynamic_slice_in_dim(prompt_embs, start, NUM_CORE_EMBS, axis=1)
    core_end = start + NUM_CORE_EMBS
    if list_extra_words is not None:
        extra = prompt_embs[:, core_end:core_end + EXTRA_WORDS_MAX_TOKENS] * zs_extra_words_scale
        core = jnp.concatenate([core, extra], axis=1)

    # boundary indices in the reference (start=4): 22 = start+16+2 (after the
    # two extra-word slots), last index = EOS
    after = core_end + EXTRA_WORDS_MAX_TOKENS
    seq = prompt_embs.shape[1]
    pad_embeddings = pad_embeddings.astype(prompt_embs.dtype)

    outs = []
    for emb_type in return_emb_types:
        if emb_type == "full":
            outs.append(prompt_embs)
        elif emb_type == "full_pad":
            # fill [after, seq-1) with pad embeddings (adaface/util.py:217-221)
            mask = ((np.arange(seq) >= after) & (np.arange(seq) < seq - 1))
            outs.append(_fill(prompt_embs, pad_embeddings, mask))
        elif emb_type == "full_half_pad":
            pads = seq - after - 1
            mask = np.zeros(seq, bool)
            if pads >= 2:
                mask[after:after + pads // 2] = True
            outs.append(_fill(prompt_embs, pad_embeddings, mask))
        elif emb_type == "full_zeroed_extra":
            mask = np.zeros(seq, bool)
            mask[after:after + 2] = True
            out = _fill(prompt_embs, pad_embeddings, mask)
            zero_mask = ((np.arange(seq) >= after + 2) & (np.arange(seq) < seq - 1))
            out = jnp.where(jnp.asarray(zero_mask)[None, :, None], 0.0, out)
            outs.append(out)
        elif emb_type == "core":
            outs.append(core)
        elif emb_type == "b_core_e":
            outs.append(jnp.concatenate([prompt_embs[:, :after],
                                         prompt_embs[:, -1:]], axis=1))
        else:
            raise ValueError(f"unknown emb type {emb_type!r}")
    return outs


def _fill(prompt_embs, pad_embeddings, mask_np):
    mask = jnp.asarray(mask_np)[None, :, None]
    return jnp.where(mask, pad_embeddings[None], prompt_embs)


def generate_pad_embeddings(text_params: dict, tokenizer: CLIPTokenizer,
                            text_cfg: clip_text.CLIPTextConfig = clip_text.SD15_TEXT_CONFIG,
                            max_length: int = 77) -> jax.Array:
    """[77,768] embeddings of the pad (EOS) token at every position,
    positional embeddings included (SubjBasisGenerator.generate_pad_embeddings,
    subj_basis_generator.py:587-602). Detached by construction."""
    ids = jnp.full((1, max_length), tokenizer.eos_id, jnp.int32)
    embs = clip_text.token_embed(text_params, ids) + text_params["position_embedding"][None]
    return jax.lax.stop_gradient(embs[0])
