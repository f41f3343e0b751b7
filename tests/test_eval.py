"""Tests for the evaluation harness (tiny random models; behavioral
properties instead of pretrained-weight goldens)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaprompt_tpu.eval import prompts as ep
from adaprompt_tpu.eval.face_eval import (FaceSimilarityEvaluator,
                                          calc_faces_mean_similarity,
                                          center_crop_detector)
from adaprompt_tpu.eval.clip_scorer import CLIPScorer
from adaprompt_tpu.eval.dino_eval import DINOEvaluator
from adaprompt_tpu.models import clip_text, clip_vision, dino as dino_mod, arcface


def test_format_prompt_list():
    pl, short, long_ = ep.format_prompt_list("z", z_prefix="portrait of",
                                             class_token="person",
                                             class_long_token="a person",
                                             broad_class=1,
                                             prompt_set_name="dreambench",
                                             use_fp_trick=True)
    assert len(pl) == len(short) == len(long_) == len(ep.ANIMAL_PROMPT_LIST)
    assert "portrait of z" in pl[0]
    assert pl[0].startswith("a face portrait of ")
    assert "person" in short[0]


def test_calc_faces_mean_similarity_skips_empty():
    e = np.eye(4, dtype=np.float32)
    src = [e[:1], np.zeros((0, 4), np.float32)]
    dst = [e[:1], e[1:2]]
    avg, s0, d0 = calc_faces_mean_similarity(src, dst)
    assert s0 == 1 and d0 == 0
    np.testing.assert_allclose(avg, 0.5)  # pairs: (1.0 + 0.0)/2


def test_face_evaluator_pipeline():
    cfg = arcface.IResNetConfig(layers=(1, 1, 1, 1), planes=(8, 16, 32, 64),
                                num_features=32, input_size=112)
    params = arcface.init_params(jax.random.PRNGKey(0), cfg)
    ev = FaceSimilarityEvaluator(params, cfg)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (160, 200, 3), dtype=np.uint8)
    embs = ev.embed_image(img)
    assert embs.shape == (1, 32)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, rtol=1e-5)
    # same image twice -> similarity 1
    avg, _, _ = calc_faces_mean_similarity([embs], [embs])
    np.testing.assert_allclose(avg, 1.0, rtol=1e-5)


def test_clip_scorer_properties():
    tcfg = clip_text.CLIPTextConfig(hidden_size=64, intermediate_size=128,
                                    num_layers=2, num_heads=4)
    vcfg = clip_vision.CLIPVisionConfig(image_size=32, patch_size=8,
                                        hidden_size=64, intermediate_size=128,
                                        num_layers=2, num_heads=4,
                                        projection_dim=32)
    scorer = CLIPScorer.random_init(0, text_cfg=tcfg, vision_cfg=vcfg)
    rng = np.random.default_rng(1)
    imgs = rng.uniform(-1, 1, (3, 40, 40, 3)).astype(np.float32)
    # self-similarity diag == 1
    s = scorer.image_pairwise_similarity(imgs, imgs, reduction="diag")
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-4)
    sim_img, sim_text = scorer.evaluate(imgs, imgs, "a photo of a * person")
    assert -1.01 <= sim_text <= 1.01 and 0.0 < sim_img <= 1.01


def test_dino_evaluator():
    cfg = dino_mod.ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                             intermediate_size=128, num_layers=2, num_heads=4)
    params = dino_mod.init_params(jax.random.PRNGKey(0), cfg)
    ev = DINOEvaluator(params, cfg)
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (48, 48, 3), dtype=np.uint8) for _ in range(2)]
    s = ev.image_pairwise_similarity(imgs, imgs, reduction="none")
    np.testing.assert_allclose(np.asarray(jnp.diagonal(s)), 1.0, atol=1e-4)
