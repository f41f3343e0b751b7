"""DINO ViT-S/16 in JAX — the DINO image-similarity eval model.

The reference scores DINO CLS-token cosine similarity between generated and
reference images (/root/reference/evaluation/dino_eval.py, facebook/dino-vits16
= a transformers ViTModel). Standard pre-LN ViT: patch conv, CLS token,
learned positions, GELU MLP, final LN; CLS token of the last layer is the
image embedding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.ops.attention import dot_product_attention
from adaprompt_tpu.ops.layers import layer_norm, linear


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 384
    intermediate_size: int = 1536
    num_layers: int = 12
    num_heads: int = 6
    layer_norm_eps: float = 1e-12

    @property
    def seq_len(self):
        return (self.image_size // self.patch_size) ** 2 + 1


DINO_VITS16 = ViTConfig()


def init_params(key: jax.Array, cfg: ViTConfig = DINO_VITS16, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    d, i = cfg.hidden_size, cfg.intermediate_size

    def w(shape, scale=0.02):
        return (jax.random.normal(next(ks), shape) * scale).astype(dtype)

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def lyr():
        return {"ln1": ln(),
                "attn": {n: {"kernel": w((d, d)), "bias": jnp.zeros((d,), dtype)}
                         for n in ("q", "k", "v", "out")},
                "ln2": ln(),
                "mlp": {"fc1": {"kernel": w((d, i)), "bias": jnp.zeros((i,), dtype)},
                        "fc2": {"kernel": w((i, d)), "bias": jnp.zeros((d,), dtype)}}}

    return {
        "cls_token": w((1, 1, d)),
        "patch_embedding": {"kernel": w((cfg.patch_size, cfg.patch_size, 3, d)),
                            "bias": jnp.zeros((d,), dtype)},
        "position_embedding": w((cfg.seq_len, d)),
        "layers": [lyr() for _ in range(cfg.num_layers)],
        "final_ln": ln(),
    }


def from_torch(state_dict, cfg: ViTConfig = DINO_VITS16, dtype=jnp.float32) -> dict:
    """Port a transformers ViTModel state_dict (facebook/dino-vits16)."""
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("vit.")
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
        p = f"encoder.layer.{li}"
        layers.append({
            "ln1": ln(p + ".layernorm_before"),
            "attn": {"q": lin(p + ".attention.attention.query"),
                     "k": lin(p + ".attention.attention.key"),
                     "v": lin(p + ".attention.attention.value"),
                     "out": lin(p + ".attention.output.dense")},
            "ln2": ln(p + ".layernorm_after"),
            "mlp": {"fc1": lin(p + ".intermediate.dense"),
                    "fc2": lin(p + ".output.dense")},
        })
    return {
        "cls_token": jnp.asarray(sd["embeddings.cls_token"], dtype),
        "patch_embedding": {
            "kernel": jnp.asarray(
                sd["embeddings.patch_embeddings.projection.weight"].transpose(2, 3, 1, 0), dtype),
            "bias": jnp.asarray(sd["embeddings.patch_embeddings.projection.bias"], dtype)},
        "position_embedding": jnp.asarray(sd["embeddings.position_embeddings"][0], dtype),
        "layers": layers,
        "final_ln": ln("layernorm"),
    }


def encode(params: dict, pixel_values: jax.Array, cfg: ViTConfig = DINO_VITS16) -> jax.Array:
    """[B, H, W, 3] -> CLS embeddings [B, D] (after final LN)."""
    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixel_values, params["patch_embedding"]["kernel"].astype(pixel_values.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = patches + params["patch_embedding"]["bias"].astype(patches.dtype)
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size)).astype(patches.dtype)
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + params["position_embedding"][None].astype(x.dtype)

    nh = cfg.num_heads
    for lp in params["layers"]:
        h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
        bsz, s, d = h.shape
        hd = d // nh
        q = linear(h, lp["attn"]["q"]["kernel"], lp["attn"]["q"]["bias"]).reshape(bsz, s, nh, hd)
        k = linear(h, lp["attn"]["k"]["kernel"], lp["attn"]["k"]["bias"]).reshape(bsz, s, nh, hd)
        v = linear(h, lp["attn"]["v"]["kernel"], lp["attn"]["v"]["bias"]).reshape(bsz, s, nh, hd)
        a = dot_product_attention(q, k, v, use_flash=False).reshape(bsz, s, d)
        x = x + linear(a, lp["attn"]["out"]["kernel"], lp["attn"]["out"]["bias"])
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
        h = linear(jax.nn.gelu(linear(h, lp["mlp"]["fc1"]["kernel"], lp["mlp"]["fc1"]["bias"]),
                               approximate=False),
                   lp["mlp"]["fc2"]["kernel"], lp["mlp"]["fc2"]["bias"])
        x = x + h

    x = layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"], cfg.layer_norm_eps)
    return x[:, 0]


DINO_IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
DINO_IMAGE_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(images_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    import jax.image
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], size, size, 3), method="bicubic")
    return np.asarray((x - DINO_IMAGE_MEAN) / DINO_IMAGE_STD)
