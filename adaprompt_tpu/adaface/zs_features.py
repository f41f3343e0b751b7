"""Zero-shot image feature extraction for the AdaFace encoder.

Equivalent of LatentDiffusion.encode_zero_shot_image_features
(/root/reference/ldm/models/diffusion/ddpm.py:2322-2471):

  * CLIP-vision pass over the fg-masked image and the bg-masked image,
    each minus the "zero image" features, each scaled by the flattened mask,
    concatenated -> zs_clip_features [B, 2*(P+1), width]
    (second-to-last hidden states, masked CLIP vision tower);
  * ArcFace identity embeddings (on-device IResNet; detection host-side) for
    faces, or DINO CLS embeddings for objects;
  * optional averaging over the reference set (inference path).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.models import clip_vision, dino as dino_mod
from adaprompt_tpu.train.fgbg import bilinear_resize_torch


def extract_zs_clip_features(vision_params: dict, pixel_values: jax.Array,
                             fg_masks: jax.Array | None,
                             cfg: clip_vision.CLIPVisionConfig,
                             neg_features: jax.Array | None = None):
    """pixel_values: [B, H, W, 3] CLIP-normalized; fg_masks: [B, H, W, 1]
    in {0,1} (None -> all ones). Returns (clip_features [B, 2S, D],
    neg_features) with S = num_patches + 1."""
    b = pixel_values.shape[0]
    if fg_masks is None:
        fg_masks = jnp.ones(pixel_values.shape[:3] + (1,), jnp.float32)
    else:
        fg_masks = bilinear_resize_torch(fg_masks.astype(jnp.float32),
                                         pixel_values.shape[1:3])

    if neg_features is None:
        neg = clip_vision.encode(vision_params, jnp.zeros_like(pixel_values[:1]),
                                 cfg=cfg, output_hidden_states=True)
        neg_features = jax.lax.stop_gradient(neg["hidden_states"][-2])

    def masked_pass(mask):
        out = clip_vision.encode(vision_params, pixel_values, cfg=cfg,
                                 attn_mask=mask, output_hidden_states=True)
        feats = out["hidden_states"][-2] - neg_features
        # scale by the flattened patch mask with CLS prepended as 1
        # (CLIPVisionModelWithMask returns attn_mask [B, S, 1];
        # subj_basis_generator.py:734-736 + ddpm.py:2430-2437)
        grid = int(np.sqrt(cfg.num_patches))
        from adaprompt_tpu.models.vae import _resize_mask_nearest
        m = _resize_mask_nearest(mask, (grid, grid)).reshape(b, -1, 1)
        m = jnp.concatenate([jnp.ones_like(m[:, :1]), m], axis=1)
        return feats * m

    fg_feats = masked_pass(fg_masks)
    bg_feats = masked_pass(1.0 - fg_masks)
    return jnp.concatenate([fg_feats, bg_feats], axis=1), neg_features


class ZeroShotFeatureExtractor:
    """Bundles the masked CLIP vision tower with the face/DINO embedders."""

    def __init__(self, vision_params: dict, vision_cfg: clip_vision.CLIPVisionConfig,
                 face_embedder=None, dino_params=None,
                 dino_cfg: dino_mod.ViTConfig = dino_mod.DINO_VITS16):
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self.face_embedder = face_embedder
        self.dino_params = dino_params
        self.dino_cfg = dino_cfg
        self._neg_features = None

    def __call__(self, images_uint8, fg_masks=None, is_face: bool = True,
                 calc_avg: bool = False, key: jax.Array | None = None):
        """images_uint8: list/array of [H, W, 3] uint8. fg_masks: matching
        [H, W] {0,1} arrays or None. Returns (clip_features, id_embs,
        faceless_count)."""
        imgs = np.stack([np.asarray(i) for i in images_uint8])
        pixel_values = jnp.asarray(clip_vision.preprocess(imgs, self.vision_cfg.image_size))
        masks = None
        if fg_masks is not None:
            masks = jnp.asarray(np.stack([np.asarray(m, np.float32) for m in fg_masks]))[..., None]

        clip_features, self._neg_features = extract_zs_clip_features(
            self.vision_params, pixel_values, masks, self.vision_cfg,
            self._neg_features)

        faceless = 0
        id_embs = None
        if is_face and self.face_embedder is not None:
            embs = []
            for i, img in enumerate(imgs):
                e = self.face_embedder.embed_image(img)
                if len(e) == 0:
                    faceless += 1
                    if key is None:
                        key = jax.random.PRNGKey(0)
                    key, k = jax.random.split(key)
                    embs.append(np.asarray(jax.random.normal(k, (512,))))
                else:
                    embs.append(e[0])
            id_embs = jnp.asarray(np.stack(embs))
        elif not is_face and self.dino_params is not None:
            x = jnp.asarray(dino_mod.preprocess(imgs, self.dino_cfg.image_size))
            id_embs = dino_mod.encode(self.dino_params, x, self.dino_cfg)

        if calc_avg:
            clip_features = clip_features.mean(axis=0, keepdims=True)
            if id_embs is not None:
                m = id_embs.mean(axis=0, keepdims=True)
                id_embs = m / jnp.linalg.norm(m, axis=-1, keepdims=True)

        return clip_features, id_embs, faceless
