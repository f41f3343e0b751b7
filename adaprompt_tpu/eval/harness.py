"""Folder-level evaluation orchestration.

Equivalent of compare_folders (/root/reference/evaluation/eval_utils.py:45-87)
and the per-subject scoring loop of scripts/gen_subjects_and_eval.py:
CLIP image/text similarity + DINO similarity + ArcFace identity similarity
between a reference-photo folder and a generated-sample folder.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator, list_images


@dataclasses.dataclass
class FolderScores:
    sim_img: float
    sim_text: float
    sim_dino: float
    sim_face: float | None = None


def load_images_pm1(paths, size: int = 256) -> np.ndarray:
    """Images as [-1,1] float arrays [N, size, size, 3] (PersonalizedBase
    'image' field semantics: resize + scale)."""
    from PIL import Image
    out = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize((size, size), Image.BICUBIC)
        out.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    return np.stack(out)


def load_images_uint8(paths, size: int = 256) -> list:
    from PIL import Image
    return [np.asarray(Image.open(p).convert("RGB").resize((size, size), Image.BICUBIC))
            for p in paths]


def compare_folders(clip_scorer, dino_evaluator, gt_dir: str, samples_dir: str,
                    prompt: str, num_samples: int = -1,
                    face_evaluator: FaceSimilarityEvaluator | None = None) -> FolderScores:
    gt_paths = list_images(gt_dir)
    # drop mask files that live alongside subject photos
    gt_paths = [p for p in gt_paths if not p.endswith("_mask.png")]
    sample_paths = list_images(samples_dir, num_samples)

    gt = load_images_pm1(gt_paths)
    samples = load_images_pm1(sample_paths)
    sim_img, sim_text = clip_scorer.evaluate(samples, gt, prompt)

    sim_dino = float(dino_evaluator.image_pairwise_similarity(
        load_images_uint8(gt_paths), load_images_uint8(sample_paths)))

    sim_face = None
    if face_evaluator is not None:
        from adaprompt_tpu.eval.face_eval import calc_faces_mean_similarity
        src = face_evaluator.embed_folder(gt_paths)
        dst = face_evaluator.embed_folder(sample_paths)
        sim_face, _, _ = calc_faces_mean_similarity(src, dst)

    return FolderScores(sim_img, sim_text, sim_dino, sim_face)
