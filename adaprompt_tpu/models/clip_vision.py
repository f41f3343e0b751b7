"""CLIP vision transformer (ViT) as pure JAX functions, with the reference's
fg/bg pairwise attention-mask extension.

Serves two roles:
  1. Zero-shot image feature extraction for the AdaFace background branch —
     CLIPVisionModelWithMask (/root/reference/adaface/subj_basis_generator.py:
     633-757): a mask resized to the patch grid forms an outer-product
     pairwise mask that is fed to the encoder. NOTE: the reference passes the
     raw 0/1 pairwise mask as the HF *additive* attention mask, i.e. +1 is
     added to logits of homogeneous pairs rather than -inf to masked ones —
     we replicate that exactly (soft bias, not hard masking).
  2. CLIP image encoding for evaluation (evaluation/clip_eval.py) via the
     projection head.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.ops.attention import dot_product_attention
from adaprompt_tpu.ops.layers import layer_norm, linear, quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self):
        return self.num_patches + 1


# openai/clip-vit-large-patch14 vision tower (image_embedding_dim 1024);
# the reference uses a 1280-wide ViT-H ("laion") for zs features
# (embedding_manager zs_image_emb_dim=1024 default, 1280 in configs)
CLIP_VIT_L14_VISION = CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                                       num_layers=24, num_heads=16,
                                       projection_dim=768)
CLIP_VIT_H14_VISION = CLIPVisionConfig(hidden_size=1280, intermediate_size=5120,
                                       num_layers=32, num_heads=16,
                                       projection_dim=1024)
CLIP_VIT_B32_VISION = CLIPVisionConfig(patch_size=32, hidden_size=768,
                                       intermediate_size=3072, num_layers=12,
                                       num_heads=12, projection_dim=512)


def init_params(key: jax.Array, cfg: CLIPVisionConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    d, i = cfg.hidden_size, cfg.intermediate_size

    def w(shape, scale=0.02):
        return (jax.random.normal(next(ks), shape) * scale).astype(dtype)

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def lyr():
        return {
            "ln1": ln(),
            "attn": {n: {"kernel": w((d, d)), "bias": jnp.zeros((d,), dtype)}
                     for n in ("q", "k", "v", "out")},
            "ln2": ln(),
            "mlp": {"fc1": {"kernel": w((d, i)), "bias": jnp.zeros((i,), dtype)},
                    "fc2": {"kernel": w((i, d)), "bias": jnp.zeros((d,), dtype)}},
        }

    return {
        "class_embedding": w((d,)),
        "patch_embedding": w((cfg.patch_size, cfg.patch_size, 3, d)),  # HWIO
        "position_embedding": w((cfg.seq_len, d)),
        "pre_ln": ln(),
        "layers": [lyr() for _ in range(cfg.num_layers)],
        "post_ln": ln(),
        "projection": {"kernel": w((d, cfg.projection_dim))},
    }


def from_torch(state_dict, cfg: CLIPVisionConfig, dtype=jnp.float32) -> dict:
    """Port transformers CLIPVisionModel(/WithProjection) weights."""
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("vision_model.")
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    def lin(p):
        return {"kernel": jnp.asarray(sd[p + ".weight"].T, dtype),
                "bias": jnp.asarray(sd[p + ".bias"], dtype)}

    def ln(p):
        return {"scale": jnp.asarray(sd[p + ".weight"], dtype),
                "bias": jnp.asarray(sd[p + ".bias"], dtype)}

    layers = []
    for li in range(cfg.num_layers):
        p = f"encoder.layers.{li}"
        layers.append({
            "ln1": ln(p + ".layer_norm1"),
            "attn": {"q": lin(p + ".self_attn.q_proj"), "k": lin(p + ".self_attn.k_proj"),
                     "v": lin(p + ".self_attn.v_proj"), "out": lin(p + ".self_attn.out_proj")},
            "ln2": ln(p + ".layer_norm2"),
            "mlp": {"fc1": lin(p + ".mlp.fc1"), "fc2": lin(p + ".mlp.fc2")},
        })
    out = {
        "class_embedding": jnp.asarray(sd["embeddings.class_embedding"], dtype),
        "patch_embedding": jnp.asarray(
            sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0), dtype),
        "position_embedding": jnp.asarray(sd["embeddings.position_embedding.weight"], dtype),
        "pre_ln": ln("pre_layrnorm"),
        "layers": layers,
        "post_ln": ln("post_layernorm"),
    }
    if "visual_projection.weight" in sd:
        out["projection"] = {"kernel": jnp.asarray(sd["visual_projection.weight"].T, dtype)}
    return out


def _attn(p, x, mask, num_heads):
    b, s, d = x.shape
    hd = d // num_heads
    q = linear(x, p["q"]["kernel"], p["q"]["bias"]).reshape(b, s, num_heads, hd)
    k = linear(x, p["k"]["kernel"], p["k"]["bias"]).reshape(b, s, num_heads, hd)
    v = linear(x, p["v"]["kernel"], p["v"]["bias"]).reshape(b, s, num_heads, hd)
    o = dot_product_attention(q, k, v, mask=mask, use_flash=False)
    return linear(o.reshape(b, s, d), p["out"]["kernel"], p["out"]["bias"])


def encode(params: dict, pixel_values: jax.Array, *,
           cfg: CLIPVisionConfig,
           attn_mask: jax.Array | None = None,
           output_hidden_states: bool = False):
    """pixel_values [B, H, W, 3] (normalized, NHWC).

    attn_mask: optional [B, H, W, 1] fg mask; resized to the patch grid with
    a prepended 1 for CLS, then the *pairwise product* mask is ADDED to
    attention logits (subj_basis_generator.py:690-714 semantics).

    Returns dict(last_hidden_state [B,S,D], pooled [B,D],
                 image_embeds [B,P] if projection present,
                 hidden_states list when requested).
    """
    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixel_values, params["patch_embedding"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embedding"][None, None], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls.astype(patches.dtype), patches], axis=1)
    x = x + params["position_embedding"][None].astype(x.dtype)
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], cfg.layer_norm_eps)

    mask = None
    if attn_mask is not None:
        grid = int(np.sqrt(cfg.num_patches))
        from adaprompt_tpu.models.vae import _resize_mask_nearest
        m = _resize_mask_nearest(attn_mask, (grid, grid)).reshape(b, 1, -1)
        m = jnp.concatenate([jnp.ones_like(m[:, :, :1]), m], axis=-1)  # [B,1,S]
        # pairwise outer product, ADDED to logits (reference behavior)
        mask = jnp.einsum("boq,bok->bqk", m, m)[:, None]  # [B,1,S,S]

    hidden_states = []
    for lp in params["layers"]:
        hidden_states.append(x)
        r = x
        x = r + _attn(lp["attn"], layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps), mask, cfg.num_heads)
        r = x
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
        h = linear(quick_gelu(linear(h, lp["mlp"]["fc1"]["kernel"], lp["mlp"]["fc1"]["bias"])),
                   lp["mlp"]["fc2"]["kernel"], lp["mlp"]["fc2"]["bias"])
        x = r + h
    hidden_states.append(x)

    pooled = layer_norm(x[:, 0], params["post_ln"]["scale"], params["post_ln"]["bias"], cfg.layer_norm_eps)
    out = {"last_hidden_state": x, "pooled": pooled}
    if "projection" in params:
        out["image_embeds"] = linear(pooled, params["projection"]["kernel"])
    if output_hidden_states:
        out["hidden_states"] = hidden_states
    return out


CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(images_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 [B,H,W,3] -> normalized float32 [B,size,size,3] (bicubic resize
    + CLIP normalization; CLIPImageProcessor equivalent)."""
    import jax.image
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], size, size, 3), method="bicubic")
    x = (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return np.asarray(x)
