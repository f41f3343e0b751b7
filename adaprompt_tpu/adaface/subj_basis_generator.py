"""SubjBasisGenerator — the AdaFace encoder, as pure JAX functions.

Re-architecture of /root/reference/adaface/subj_basis_generator.py:359-631.

Subject branch: a finetunable CLIP text model (`prompt2token_proj`) *inverts*
Arc2Face core ID embeddings back into SD's prompt space via
`inverse_face_prompt_embs`, with learnable last-3-hidden-layer weights
(init [1,2,4], grad scale 5) and an output gradient scale of 0.4
(subj_basis_generator.py:403-413, 496-530, 569-585). The 16 core output
embeddings are repeated across the 16 UNet CA layers (557-558) and optionally
blended with pad embeddings when out_id_embs_scale < 1 (560-565).

Background branch: Linear(1280->768)+LN projection of CLIP image-patch
features, learned positional embeddings and latent queries, and a single
cross-attention "prompt_translator" (to_q/to_k/to_v Linear+LN, V skip
connection, identity to_out, d**-0.25 paired scaling) producing 16 layers x 4
background embeddings scaled by 768**-0.5 (416-443, 543-555, CrossAttention
211-357 with q_aware_to_v=False).

Object branch (non-face subjects): ExpandEmbs DINO projection
(subj_basis_generator.py:122-130, 397-399): Linear(384 -> 16*768, no bias)
+ LN.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.adaface import arc2face
from adaprompt_tpu.adaface.gradient import grad_scale
from adaprompt_tpu.models import clip_text
from adaprompt_tpu.ops.layers import layer_norm, linear
from adaprompt_tpu.utils.tokenizer import CLIPTokenizer


@dataclasses.dataclass(frozen=True)
class SubjBasisConfig:
    placeholder_is_bg: bool = False
    num_out_layers: int = 16
    num_out_embs_per_layer: int = 16        # 16 subj / 4 bg
    num_id_vecs_bg: int = 257               # CLIP vision tokens
    image_embedding_dim: int = 1280         # CLIP-H vision width
    dino_embedding_dim: int = 384
    output_dim: int = 768
    num_heads: int = 6
    prompt2token_proj_grad_scale: float = 0.4
    zs_extra_words_scale: float = 0.5
    hidden_weights_grad_scale: float = 5.0
    text_cfg: clip_text.CLIPTextConfig = clip_text.SD15_TEXT_CONFIG


SUBJ_CONFIG = SubjBasisConfig(placeholder_is_bg=False, num_out_embs_per_layer=16)
BG_CONFIG = SubjBasisConfig(placeholder_is_bg=True, num_out_embs_per_layer=4)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _ln_init(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_params(key: jax.Array, cfg: SubjBasisConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 16))
    d = cfg.output_dim
    if not cfg.placeholder_is_bg:
        return {
            # learnable clip-skip weights over the last 3 hidden states,
            # init [1, 2, 4] (subj_basis_generator.py:576-583)
            "hidden_state_layer_weights": jnp.asarray([[1.0], [2.0], [4.0]], dtype),
            # full CLIP text model, finetuned (the checkpoint provides real
            # weights; random init here for tests)
            "prompt2token_proj": clip_text.init_params(next(ks), cfg.text_cfg, dtype),
            # DINO object projection: Linear(384 -> 16*768, no bias) + LN
            "obj_proj_in": {
                "kernel": (jax.random.normal(next(ks), (cfg.dino_embedding_dim,
                                                        16 * d)) * 0.02).astype(dtype),
                "ln": _ln_init(d, dtype),
            },
        }
    inner = d
    def lin_ln(cin):
        return {"kernel": (jax.random.normal(next(ks), (cin, inner)) * 0.02).astype(dtype),
                "ln": _ln_init(inner, dtype)}
    n_out = cfg.num_out_layers * cfg.num_out_embs_per_layer
    return {
        "pos_embs": (jax.random.normal(next(ks), (1, cfg.num_id_vecs_bg, d))).astype(dtype),
        "pos_embs_ln": _ln_init(d, dtype),
        "latent_queries": (jax.random.normal(next(ks), (1, n_out, d))).astype(dtype),
        "latent_queries_ln": _ln_init(d, dtype),
        "bg_proj_in": {"kernel": (jax.random.normal(next(ks), (cfg.image_embedding_dim, d)) * 0.02).astype(dtype),
                       "ln": _ln_init(d, dtype)},
        "prompt_translator": {
            "to_q": lin_ln(d),
            "to_k": lin_ln(d),
            "to_v": lin_ln(d),
        },
    }


def from_torch(state_dict, cfg: SubjBasisConfig, dtype=jnp.float32) -> dict:
    """Port a torch SubjBasisGenerator state_dict (as stored inside the
    embedding-manager checkpoint's string_to_subj_basis_generator_dict)."""
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().to_dense().float().cpu().numpy() if v.is_sparse else v.detach().float().cpu().numpy()
        sd[k] = np.asarray(v)

    def ln(p):
        return {"scale": jnp.asarray(sd[p + ".weight"], dtype),
                "bias": jnp.asarray(sd[p + ".bias"], dtype)}

    if not cfg.placeholder_is_bg:
        proj_sd = {k.removeprefix("prompt2token_proj."): v for k, v in sd.items()
                   if k.startswith("prompt2token_proj.")}
        params = {
            "hidden_state_layer_weights": jnp.asarray(sd["hidden_state_layer_weights"], dtype),
            "prompt2token_proj": clip_text.from_torch(proj_sd, cfg.text_cfg, dtype),
        }
        if "obj_proj_in.0.weight" in sd:
            params["obj_proj_in"] = {
                "kernel": jnp.asarray(sd["obj_proj_in.0.weight"].T, dtype),
                "ln": ln("obj_proj_in.2"),
            }
        return params

    # bg branch; reference module names (subj_basis_generator.py:422-443)
    def lin_ln(p_lin, p_ln):
        return {"kernel": jnp.asarray(sd[p_lin + ".weight"].T, dtype), "ln": ln(p_ln)}

    return {
        "pos_embs": jnp.asarray(sd["pos_embs"], dtype),
        "pos_embs_ln": ln("pos_embs_ln"),
        "latent_queries": jnp.asarray(sd["latent_queries"], dtype),
        "latent_queries_ln": ln("latent_queries_ln"),
        "bg_proj_in": {"kernel": jnp.asarray(sd["bg_proj_in.0.weight"].T, dtype),
                       "ln": ln("bg_proj_in.1")},
        "prompt_translator": {
            "to_q": lin_ln("prompt_translator.to_q.0", "prompt_translator.to_q.1"),
            "to_k": lin_ln("prompt_translator.to_k.0", "prompt_translator.to_k.1"),
            "to_v": lin_ln("prompt_translator.to_v.0", "prompt_translator.to_v.1"),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _bg_cross_attention(p: dict, q_in: jax.Array, context: jax.Array,
                        num_heads: int) -> jax.Array:
    """The bg prompt_translator CrossAttention (subj_basis_generator.py:211-357
    with identity_to_v=False, v_has_skip=True, q_aware_to_v=False,
    identity_to_out=True)."""
    def proj(pp, x):
        y = linear(x, pp["kernel"])
        return layer_norm(y, pp["ln"]["scale"], pp["ln"]["bias"])

    q = proj(p["to_q"], q_in)
    k = proj(p["to_k"], context)
    v = proj(p["to_v"], context) + context  # v skip

    b, nq, d = q.shape
    nk = k.shape[1]
    hd = d // num_heads
    qh = q.reshape(b, nq, num_heads, hd)
    kh = k.reshape(b, nk, num_heads, hd)
    vh = v.reshape(b, nk, num_heads, hd)
    scale = hd ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, nq, d)
    return out  # identity to_out


def forward(params: dict, cfg: SubjBasisConfig, tokenizer: CLIPTokenizer,
            arc2face_id_embs: jax.Array | None = None,
            clip_features: jax.Array | None = None,
            raw_id_embs: jax.Array | None = None,
            *,
            out_id_embs_scale: float = 1.0,
            is_face: bool = True,
            is_training: bool = False,
            adaface_prompt_embs_inf_type: str = "full_half_pad",
            pad_embeddings: jax.Array | None = None):
    """-> (adaface_subj_embs [B, L, K, 768], adaface_prompt_embs [B,77,768]|None)

    Mirrors SubjBasisGenerator.forward (subj_basis_generator.py:470-567).
    """
    adaface_prompt_embs = None
    if not cfg.placeholder_is_bg:
        if is_face:
            assert arc2face_id_embs is not None
            if pad_embeddings is None:
                pad_embeddings = arc2face.generate_pad_embeddings(
                    params["prompt2token_proj"], tokenizer, cfg.text_cfg)
            hw = grad_scale(params["hidden_state_layer_weights"],
                            cfg.hidden_weights_grad_scale)
            emb_type = "full_pad" if is_training else adaface_prompt_embs_inf_type
            proj = params["prompt2token_proj"]
            if cfg.prompt2token_proj_grad_scale == 0:
                proj = jax.lax.stop_gradient(proj)
            adaface_prompt_embs, core_id_embs = arc2face.inverse_face_prompt_embs(
                proj, tokenizer, arc2face_id_embs,
                (emb_type, "core"), pad_embeddings,
                hidden_state_layer_weights=hw,
                zs_extra_words_scale=cfg.zs_extra_words_scale,
                text_cfg=cfg.text_cfg)
            adaface_prompt_embs = grad_scale(adaface_prompt_embs,
                                             cfg.prompt2token_proj_grad_scale)
            core_id_embs = grad_scale(core_id_embs, cfg.prompt2token_proj_grad_scale)
            # repeat core embeddings across the 16 output layers
            subj_embs = jnp.tile(core_id_embs[:, None], (1, cfg.num_out_layers, 1, 1))
        elif raw_id_embs is not None:
            # DINO object branch: [B,384] -> [B,16,768] -> repeat to layers
            h = linear(raw_id_embs, params["obj_proj_in"]["kernel"])
            h = h.reshape(h.shape[0], 16, cfg.output_dim)
            h = layer_norm(h, params["obj_proj_in"]["ln"]["scale"],
                           params["obj_proj_in"]["ln"]["bias"])
            subj_embs = jnp.tile(h[:, None], (1, cfg.num_out_layers, 1, 1))
        else:
            raise ValueError("need arc2face_id_embs (face) or raw_id_embs (object)")
    else:
        assert clip_features is not None
        b = clip_features.shape[0]
        id_embs = linear(clip_features, params["bg_proj_in"]["kernel"])
        id_embs = layer_norm(id_embs, params["bg_proj_in"]["ln"]["scale"],
                             params["bg_proj_in"]["ln"]["bias"])
        pos = layer_norm(params["pos_embs"], params["pos_embs_ln"]["scale"],
                         params["pos_embs_ln"]["bias"])
        id_embs = id_embs + pos
        lq = layer_norm(params["latent_queries"], params["latent_queries_ln"]["scale"],
                        params["latent_queries_ln"]["bias"])
        lq = jnp.tile(lq, (b, 1, 1))
        out = _bg_cross_attention(params["prompt_translator"], lq, id_embs, cfg.num_heads)
        out = out.reshape(b, cfg.num_out_layers, cfg.num_out_embs_per_layer, cfg.output_dim)
        subj_embs = out * (cfg.output_dim ** -0.5)

    if out_id_embs_scale != 1.0:
        # blend with pad embeddings (subj_basis_generator.py:560-565);
        # reference slices pad_embeddings[4:4+K] — the first K core positions
        if pad_embeddings is None and not cfg.placeholder_is_bg:
            pad_embeddings = arc2face.generate_pad_embeddings(
                params["prompt2token_proj"], tokenizer, cfg.text_cfg)
        k = cfg.num_out_embs_per_layer
        pads = pad_embeddings[4:4 + k][None, None]
        subj_embs = subj_embs * out_id_embs_scale + pads * (1.0 - out_id_embs_scale)

    return subj_embs, adaface_prompt_embs


def extend_prompt2token_proj_attention(params: dict, key: jax.Array,
                                       multiplier: int = 2, noise_std: float = 0.1,
                                       begin_layer: int = -1, end_layer: int = -1) -> dict:
    """K/V multiplier surgery on prompt2token_proj
    (subj_basis_generator.py:604-608)."""
    out = dict(params)
    out["prompt2token_proj"] = clip_text.extend_attention_mkv(
        params["prompt2token_proj"], key, multiplier, noise_std, begin_layer, end_layer)
    return out
