"""CLIP text transformer as pure JAX functions.

This single implementation serves every CLIP-text role the reference uses:

  1. The frozen SD-1.5 conditioning encoder with *clip-skip* (weighted sum of
     the last-N pre-final-LN hidden states) and an *inputs_embeds injection
     point* where subject embeddings are spliced into the prompt
     (reference: ldm/modules/encoders/modules.py:179-463 FrozenCLIPEmbedder,
     four monkey-patched forwards; here the same semantics are one pure
     function with explicit arguments).
  2. The Arc2Face text encoder that consumes precomputed token embeddings and
     returns the raw token-embedding table lookups on demand
     (reference: adaface/arc2face_models.py:175-280 CLIPTextModelWrapper).
  3. The AdaFace `prompt2token_proj` inverse projection, including the
     learnable last-3-hidden-layer weights and the K/V-multiplier ("MKV")
     attention surgery (reference: adaface/arc2face_models.py:16-173
     CLIPAttentionMKV, extend_clip_attention_MKV_multiplier:285-302).

Differences from the torch reference are architectural, not semantic:
  * no monkey patching — injection/skip-weights are plain function arguments;
  * hidden states for clip-skip are collected in one forward pass;
  * the K/V multiplier is a per-layer parameter shape ([D, D*m]) handled by a
    single attention routine, not a swapped-in module class.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.ops.attention import dot_product_attention, causal_mask
from adaprompt_tpu.ops.layers import layer_norm, linear, quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


SD15_TEXT_CONFIG = CLIPTextConfig()  # openai/clip-vit-large-patch14 text tower


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: CLIPTextConfig, dtype=jnp.float32) -> dict:
    """Random init (normal 0.02) — for tests; real weights come from porting."""
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))

    def w(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape) * scale).astype(dtype)

    def ln():
        return {"scale": jnp.ones((cfg.hidden_size,), dtype),
                "bias": jnp.zeros((cfg.hidden_size,), dtype)}

    def lyr():
        d, i = cfg.hidden_size, cfg.intermediate_size
        return {
            "ln1": ln(),
            "attn": {
                "q": {"kernel": w((d, d)), "bias": jnp.zeros((d,), dtype)},
                "k": {"kernel": w((d, d)), "bias": jnp.zeros((d,), dtype)},
                "v": {"kernel": w((d, d)), "bias": jnp.zeros((d,), dtype)},
                "out": {"kernel": w((d, d)), "bias": jnp.zeros((d,), dtype)},
            },
            "ln2": ln(),
            "mlp": {
                "fc1": {"kernel": w((d, i)), "bias": jnp.zeros((i,), dtype)},
                "fc2": {"kernel": w((i, d)), "bias": jnp.zeros((d,), dtype)},
            },
        }

    return {
        "token_embedding": w((cfg.vocab_size, cfg.hidden_size)),
        "position_embedding": w((cfg.max_positions, cfg.hidden_size)),
        "layers": [lyr() for _ in range(cfg.num_layers)],
        "final_ln": ln(),
    }


def from_torch(state_dict, cfg: CLIPTextConfig = SD15_TEXT_CONFIG,
               dtype=jnp.float32) -> dict:
    """Port a transformers CLIPTextModel state_dict into our pytree.

    Accepts tensors or numpy arrays; linear weights are transposed to
    [in, out]. Handles K/V-multiplier-extended checkpoints transparently
    (k_proj/v_proj weights of shape [D*m, D] become kernels [D, D*m]).
    """
    sd = {k.removeprefix("text_model."): _np(v) for k, v in state_dict.items()}

    def lin(prefix):
        return {"kernel": jnp.asarray(sd[prefix + ".weight"].T, dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        layers.append({
            "ln1": ln(f"{p}.layer_norm1"),
            "attn": {
                "q": lin(f"{p}.self_attn.q_proj"),
                "k": lin(f"{p}.self_attn.k_proj"),
                "v": lin(f"{p}.self_attn.v_proj"),
                "out": lin(f"{p}.self_attn.out_proj"),
            },
            "ln2": ln(f"{p}.layer_norm2"),
            "mlp": {"fc1": lin(f"{p}.mlp.fc1"), "fc2": lin(f"{p}.mlp.fc2")},
        })
    return {
        "token_embedding": jnp.asarray(sd["embeddings.token_embedding.weight"], dtype),
        "position_embedding": jnp.asarray(sd["embeddings.position_embedding.weight"], dtype),
        "layers": layers,
        "final_ln": ln("final_layer_norm"),
    }


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def token_embed(params: dict, input_ids: jax.Array) -> jax.Array:
    """Raw token-embedding lookups — the reference's `return_token_embs=True`
    path (adaface/arc2face_models.py:191-192). [B, S] -> [B, S, D]."""
    return params["token_embedding"][input_ids]


def _self_attn(p: dict, x: jax.Array, mask: jax.Array, num_heads: int) -> jax.Array:
    b, s, d = x.shape
    head_dim = d // num_heads
    q = linear(x, p["q"]["kernel"], p["q"]["bias"]).reshape(b, s, num_heads, head_dim)
    k = linear(x, p["k"]["kernel"], p["k"]["bias"])
    v = linear(x, p["v"]["kernel"], p["v"]["bias"])
    # K/V multiplier: extended k/v projections produce [B, S, D*m]; the m
    # copies are absorbed into the key sequence ("MKV" attention,
    # adaface/arc2face_models.py:96-135). Mask broadcasts over the m copies
    # of each position.
    m = k.shape[-1] // d
    k = k.reshape(b, s * m, num_heads, head_dim)
    v = v.reshape(b, s * m, num_heads, head_dim)
    if m > 1:
        # mask [..., Sq, Sk] -> repeat each key position m times -> [..., Sq, Sk*m]
        mask = jnp.repeat(mask, m, axis=-1)
    o = dot_product_attention(q, k, v, mask=mask, use_flash=False)
    return linear(o.reshape(b, s, d), p["out"]["kernel"], p["out"]["bias"])


def encode(params: dict, input_ids: jax.Array, *,
           cfg: CLIPTextConfig = SD15_TEXT_CONFIG,
           inputs_embeds: jax.Array | None = None,
           hidden_state_layer_weights: jax.Array | None = None,
           return_pooled: bool = False):
    """CLIP text encoding with optional embedding injection and clip-skip.

    Args:
      input_ids: [B, S] token ids (always required — drives position count
        and pooling; matches the reference which also always passes ids).
      inputs_embeds: optional [B, S, D] precomputed/patched token embeddings
        (the EmbeddingManager splice point / `input_token_embs`).
      hidden_state_layer_weights: optional [N] or [N, 1] or [N, D] weights
        over the last N pre-final-LN hidden states. They are normalized to
        sum to 1 over the layer axis (matching both FrozenCLIPEmbedder — which
        pre-normalizes — and CLIPTextModelWrapper — which normalizes in
        forward). N=1 with weight [1.0] reproduces the vanilla encoder.
      return_pooled: also return the EOS-pooled vector (argmax-of-ids rule,
        reference arc2face_models.py:251-261).

    Returns last_hidden_state [B, S, D] (after final LN), optionally
    (last_hidden_state, pooled [B, D]).
    """
    if inputs_embeds is None:
        inputs_embeds = token_embed(params, input_ids)
    seq_len = inputs_embeds.shape[1]
    x = inputs_embeds + params["position_embedding"][None, :seq_len]
    mask = causal_mask(seq_len, x.dtype)

    n_skip = 0
    if hidden_state_layer_weights is not None:
        hidden_state_layer_weights = jnp.asarray(hidden_state_layer_weights)
        n_skip = hidden_state_layer_weights.shape[0]
    collected = []

    num_layers = cfg.num_layers
    for i, lp in enumerate(params["layers"]):
        # hidden_states[i] (input of layer i) is collected; the last entry is
        # the final layer output appended below.
        if n_skip and i >= num_layers - n_skip + 1:
            collected.append(x)
        res = x
        x = res + _self_attn(lp["attn"], layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps), mask, cfg.num_heads)
        res = x
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
        h = linear(quick_gelu(linear(h, lp["mlp"]["fc1"]["kernel"], lp["mlp"]["fc1"]["bias"])),
                   lp["mlp"]["fc2"]["kernel"], lp["mlp"]["fc2"]["bias"])
        x = res + h

    if n_skip:
        collected.append(x)
        stacked = jnp.stack(collected, axis=0)  # [N, B, S, D]
        w = hidden_state_layer_weights.astype(stacked.dtype)
        if w.ndim == 1:
            w = w[:, None]
        # normalize over layers; broadcast [N, 1] or [N, D] -> [N, 1, 1, 1/D]
        w = w / jnp.sum(w, axis=0, keepdims=True)
        x = jnp.sum(stacked * w[:, None, None, :], axis=0)

    x = layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"], cfg.layer_norm_eps)

    if return_pooled:
        if cfg.eos_token_id == 2:
            # legacy configs (pre transformers PR #24773): highest token id
            eos_idx = jnp.argmax(input_ids, axis=-1)
        else:
            # first occurrence of the EOS id (robust to added tokens)
            eos_idx = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eos_idx]
        return x, pooled
    return x


def extend_attention_mkv(params: dict, key: jax.Array, multiplier: int = 2,
                         noise_std: float = 0.1,
                         begin_layer: int = -1, end_layer: int = -1) -> dict:
    """Widen k/v projections by `multiplier`, replicating + noising weights.

    TPU-native equivalent of extend_clip_attention_MKV_multiplier
    (adaface/arc2face_models.py:46-85, 285-302): the extra weight copies get
    relative Gaussian noise (std = noise_std * per-row std mean); biases are
    replicated unperturbed. Returns a new params pytree.
    """
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        skip = (begin_layer >= 0 and i < begin_layer) or (end_layer >= 0 and i >= end_layer)
        if skip:
            new_layers.append(lp)
            continue
        key, k1, k2 = jax.random.split(key, 3)
        attn = dict(lp["attn"])
        for name, sub in (("k", k1), ("v", k2)):
            kern = attn[name]["kernel"]  # [D, D*m_old]
            bias = attn[name]["bias"]
            reps = [kern] + [
                _noised(kern, jax.random.fold_in(sub, r), noise_std)
                for r in range(multiplier - 1)
            ]
            attn[name] = {"kernel": jnp.concatenate(reps, axis=-1),
                          "bias": jnp.tile(bias, multiplier)}
        nl = dict(lp)
        nl["attn"] = attn
        new_layers.append(nl)
    out = dict(params)
    out["layers"] = new_layers
    return out


def _noised(kern, key, noise_std):
    # relative noise: std scaled by the mean over rows of per-row std
    # (add_noise_to_tensor, adaface/util.py:9-24 with std_dim=-1).
    rel = jnp.std(kern, axis=-1).mean()
    return kern + jax.random.normal(key, kern.shape, kern.dtype) * (noise_std * rel)
