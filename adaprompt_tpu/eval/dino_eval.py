"""DINO image-similarity evaluation
(/root/reference/evaluation/dino_eval.py equivalent): pairwise cosine
similarity of DINO ViT-S/16 CLS embeddings between reference and generated
images."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.models import dino


class DINOEvaluator:
    def __init__(self, params, cfg: dino.ViTConfig = dino.DINO_VITS16):
        self.params = params
        self.cfg = cfg

    def get_image_features(self, images_uint8, norm: bool = True) -> jnp.ndarray:
        x = jnp.asarray(dino.preprocess(np.stack([np.asarray(i) for i in images_uint8]),
                                        size=self.cfg.image_size))
        feats = dino.encode(self.params, x, self.cfg)
        if norm:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def image_pairwise_similarity(self, images1, images2, reduction="mean"):
        f1 = self.get_image_features(images1)
        f2 = self.get_image_features(images2)
        scores = f1 @ f2.T
        if reduction == "mean":
            return scores.mean()
        if reduction == "none":
            return scores
        raise NotImplementedError(reduction)
