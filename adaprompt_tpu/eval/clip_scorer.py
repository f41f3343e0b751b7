"""CLIP similarity scoring on device.

Equivalent of the reference CLIPEvaluator / ImageDirEvaluator
(/root/reference/evaluation/clip_eval.py): ViT-B/32 image<->image and
text<->image cosine similarities over generated vs. reference images.

The openai-CLIP text tower here is the same transformer as models/clip_text
plus the text projection; images go through models/clip_vision with the
visual projection. Inputs are [-1, 1] float images (generator output), like
the reference's un-normalize + CLIP-normalize pipeline.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.models import clip_text, clip_vision
from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

# openai CLIP ViT-B/32 text tower
CLIP_B32_TEXT = clip_text.CLIPTextConfig(hidden_size=512, intermediate_size=2048,
                                         num_layers=12, num_heads=8)


@dataclasses.dataclass
class CLIPScorerParams:
    text: dict            # clip_text params
    text_projection: jax.Array  # [D, P]
    vision: dict          # clip_vision params incl. 'projection'


class CLIPScorer:
    def __init__(self, params: CLIPScorerParams, tokenizer: CLIPTokenizer,
                 text_cfg: clip_text.CLIPTextConfig = CLIP_B32_TEXT,
                 vision_cfg: clip_vision.CLIPVisionConfig = clip_vision.CLIP_VIT_B32_VISION):
        self.params = params
        self.tokenizer = tokenizer
        self.text_cfg = text_cfg
        self.vision_cfg = vision_cfg

    @classmethod
    def from_torch(cls, state_dict, tokenizer=None,
                   text_cfg=CLIP_B32_TEXT,
                   vision_cfg=clip_vision.CLIP_VIT_B32_VISION):
        """Port a transformers CLIPModel (ViT-B/32) state_dict — the weights
        behind the reference's `clip.load('ViT-B/32')` evaluator
        (/root/reference/evaluation/clip_eval.py:8-36)."""
        def np_(v):
            return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd = {k: v for k, v in state_dict.items()}
        text_sd = {k.removeprefix("text_model."): v for k, v in sd.items()
                   if k.startswith("text_model.")}
        vis_sd = {k: v for k, v in sd.items()
                  if k.startswith("vision_model.") or k == "visual_projection.weight"}
        params = CLIPScorerParams(
            text=clip_text.from_torch(text_sd, text_cfg),
            text_projection=jnp.asarray(np_(sd["text_projection.weight"]).T,
                                        jnp.float32),
            vision=clip_vision.from_torch(vis_sd, vision_cfg))
        return cls(params, tokenizer or CLIPTokenizer.load(), text_cfg, vision_cfg)

    @classmethod
    def random_init(cls, key, tokenizer=None,
                    text_cfg=CLIP_B32_TEXT,
                    vision_cfg=clip_vision.CLIP_VIT_B32_VISION):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key) if isinstance(key, int) else key, 3)
        vp = clip_vision.init_params(k2, vision_cfg)
        params = CLIPScorerParams(
            text=clip_text.init_params(k1, text_cfg),
            text_projection=jax.random.normal(k3, (text_cfg.hidden_size,
                                                   vision_cfg.projection_dim)) * 0.02,
            vision=vp)
        return cls(params, tokenizer or CLIPTokenizer.load(), text_cfg, vision_cfg)

    # -- features ---------------------------------------------------------------

    def get_text_features(self, texts, norm: bool = True) -> jax.Array:
        ids = jnp.asarray(self.tokenizer(texts, max_length=self.text_cfg.max_positions))
        _, pooled = clip_text.encode(self.params.text, ids, cfg=self.text_cfg,
                                     return_pooled=True)
        feats = pooled @ self.params.text_projection
        return _norm(feats) if norm else feats

    def get_image_features(self, images_pm1: jax.Array, norm: bool = True) -> jax.Array:
        """images in [-1, 1], [B, H, W, 3] NHWC."""
        x = self._preprocess(images_pm1)
        out = clip_vision.encode(self.params.vision, x, cfg=self.vision_cfg)
        feats = out["image_embeds"]
        return _norm(feats) if norm else feats

    def _preprocess(self, images_pm1: jax.Array) -> jax.Array:
        x = (jnp.asarray(images_pm1, jnp.float32) + 1.0) / 2.0
        size = self.vision_cfg.image_size
        x = jax.image.resize(x, (x.shape[0], size, size, 3), method="bicubic")
        mean = jnp.asarray(clip_vision.CLIP_IMAGE_MEAN)
        std = jnp.asarray(clip_vision.CLIP_IMAGE_STD)
        return (x - mean) / std

    # -- similarities (clip_eval.py:76-143 reductions) -----------------------------

    def image_pairwise_similarity(self, images1, images2, reduction="mean"):
        f1 = self.get_image_features(images1)
        f2 = self.get_image_features(images2)
        return _reduce(f1 @ f2.T, reduction)

    def txt_to_img_similarity(self, text, images, reduction="mean"):
        tf = self.get_text_features([text] if isinstance(text, str) else text)
        imf = self.get_image_features(images)
        return _reduce(tf @ imf.T, reduction)

    def evaluate(self, gen_samples, gt_samples, target_text):
        """ImageDirEvaluator.evaluate (clip_eval.py:184-193): returns
        (sim_img, sim_text); target_text strips the placeholder '*'."""
        sim_img = self.image_pairwise_similarity(gt_samples, gen_samples)
        sim_text = self.txt_to_img_similarity(target_text.replace("*", ""), gen_samples)
        return float(sim_img), float(sim_text)


def _norm(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def _reduce(scores, reduction):
    if reduction == "mean":
        return scores.mean()
    if reduction == "diag":
        return jnp.diagonal(scores)
    if reduction == "diagmean":
        return jnp.diagonal(scores).mean()
    if reduction == "none":
        return scores
    raise NotImplementedError(reduction)
