"""ArcFace identity-similarity evaluation.

Equivalent of /root/reference/evaluation/eval_utils.py:
  * calc_faces_mean_similarity (223-266): mean cosine similarity over all
    (src image, dst image) pairs, skipping images with no detected face;
  * compare_face_folders_fast (268-335): folder-vs-folder identity score.

Face detection is a pluggable host-side callable (the reference uses
insightface/retinaface on CPU); recognition runs on-device via
models/arcface. A center-crop fallback detector is provided for
detector-free environments.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


IMG_EXTENSIONS = ("jpg", "jpeg", "png", "bmp")


def list_images(path: str, num_samples: int = -1):
    if os.path.isfile(path):
        return [path]
    paths = []
    for ext in IMG_EXTENSIONS:
        paths += glob.glob(os.path.join(path, "*" + ext))
        paths += glob.glob(os.path.join(path, "*" + ext.upper()))
    paths = sorted(set(paths))
    if num_samples > 0:
        paths = paths[-num_samples:]
    return paths


def make_cascade_detector(cascade_xml_path: str, size: int = 112,
                          margin: float = 0.25):
    """Real face detection via an OpenCV Haar/LBP cascade file (pluggable
    replacement for the reference's RetinaFace host-side detection,
    adaface/util.py:242-341). Returns a detector callable yielding face
    crops resized to `size`, largest face first; empty list when no face."""
    import cv2
    cascade = cv2.CascadeClassifier(cascade_xml_path)
    if cascade.empty():
        raise ValueError(f"could not load cascade from {cascade_xml_path}")

    def detect(image_np: np.ndarray) -> list[np.ndarray]:
        gray = cv2.cvtColor(np.asarray(image_np), cv2.COLOR_RGB2GRAY)
        faces = cascade.detectMultiScale(gray, scaleFactor=1.1,
                                         minNeighbors=4)
        crops = []
        h, w = image_np.shape[:2]
        for (x, y, fw, fh) in sorted(faces, key=lambda f: -f[2] * f[3]):
            m = int(max(fw, fh) * margin)
            x0, y0 = max(x - m, 0), max(y - m, 0)
            x1, y1 = min(x + fw + m, w), min(y + fh + m, h)
            crop = image_np[y0:y1, x0:x1]
            crops.append(cv2.resize(crop, (size, size),
                                    interpolation=cv2.INTER_LINEAR))
        return crops

    return detect


def make_detector(spec: str | None, size: int = 112):
    """Detector factory:
      * 'retinaface:<Resnet50_Final.pth|.onnx>' -> the JAX RetinaFace port
        (models/retinaface) — the reference's actual detection semantics
        (regressed 5-point landmarks -> norm_crop, adaface/util.py:242-341);
      * 'bisenet:<79999_iter.pth>' -> BiSeNet-parsing detection + Umeyama
        alignment (eval/face_detect.py — asset-light fallback filling the
        same role);
      * 'cascade:<xml_path>' -> OpenCV cascade detection;
      * 'center_crop' -> center-crop fallback;
      * None -> retinaface when $ADAPROMPT_RETINAFACE_CKPT points at
        weights, else bisenet when $ADAPROMPT_BISENET_CKPT does, else
        center-crop.
    """
    if spec is None:
        rf_env = os.environ.get("ADAPROMPT_RETINAFACE_CKPT")
        bi_env = os.environ.get("ADAPROMPT_BISENET_CKPT")
        if rf_env and os.path.exists(rf_env):
            spec = f"retinaface:{rf_env}"
        elif bi_env and os.path.exists(bi_env):
            spec = f"bisenet:{bi_env}"
        else:
            spec = "center_crop"
    if spec == "center_crop":
        return None  # FaceSimilarityEvaluator defaults to center_crop
    if spec.startswith("retinaface:"):
        from adaprompt_tpu.eval.face_detect import make_retinaface_detector
        from adaprompt_tpu.models import retinaface as rf
        path = spec.split(":", 1)[1]
        if path.endswith(".onnx"):
            params = rf.from_onnx(path)
        else:
            from adaprompt_tpu.utils.torch_port import load_state_dict
            params = rf.from_torch(load_state_dict(path))
        return make_retinaface_detector(params, size=size)
    if spec.startswith("bisenet:"):
        from adaprompt_tpu.eval.face_detect import make_bisenet_detector
        from adaprompt_tpu.models import bisenet
        from adaprompt_tpu.utils.torch_port import load_state_dict
        params = bisenet.from_torch(load_state_dict(spec.split(":", 1)[1]))
        return make_bisenet_detector(params, size=size)
    if spec.startswith("cascade:"):
        return make_cascade_detector(spec.split(":", 1)[1], size=size)
    raise ValueError(f"unknown detector spec {spec!r}; use 'center_crop', "
                     "'retinaface:<pth|onnx>', 'bisenet:<pth_path>' or "
                     "'cascade:<xml_path>'")


def center_crop_detector(image_np: np.ndarray, size: int = 112) -> list[np.ndarray]:
    """Fallback 'detector': center square crop resized to 112 (for
    environments without a face detector; fine for already-cropped folders)."""
    h, w = image_np.shape[:2]
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    crop = image_np[y0:y0 + s, x0:x0 + s]
    # nearest resize via index sampling (no cv2 dependency)
    idx = (np.arange(size) * (s / size)).astype(np.int64)
    return [crop[idx][:, idx]]


class FaceSimilarityEvaluator:
    """Embeds face crops with the on-device ArcFace trunk."""

    def __init__(self, arcface_params, arcface_cfg=None, detector=None,
                 batch_size: int = 16):
        from adaprompt_tpu.models import arcface as af
        self._af = af
        self.params = arcface_params
        self.cfg = arcface_cfg or af.IRESNET100
        # default resolves through the env-aware factory: BiSeNet parsing
        # detection when $ADAPROMPT_BISENET_CKPT is set, center-crop last
        self.detector = detector or make_detector(None) or center_crop_detector
        self.batch_size = batch_size
        # one compiled executable instead of ~400 op-by-op dispatches per
        # photo (IResNet-100 depth); recompiles only on a new crop count
        self._fwd = jax.jit(lambda p, x: self._af.forward(p, x, self.cfg))

    def embed_image(self, image_np: np.ndarray) -> np.ndarray:
        """-> [num_faces, 512] L2-normalized (possibly empty)."""
        crops = self.detector(image_np)
        if not crops:
            return np.zeros((0, 512), np.float32)
        x = self._af.preprocess(np.stack(crops))
        emb = np.asarray(self._fwd(self.params, jnp.asarray(x)))
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    def embed_folder(self, paths) -> list[np.ndarray]:
        from PIL import Image
        out = []
        for p in paths:
            img = np.asarray(Image.open(p).convert("RGB"))
            out.append(self.embed_image(img))
        return out

    def __call__(self, images_np=None, image_paths=None) -> np.ndarray | None:
        """FaceEmbedder protocol for AdaFacePipeline: mean-able embeddings
        [N, 512] over the given photos (one face per photo max)."""
        if image_paths is not None:
            embs = self.embed_folder(image_paths)
        else:
            embs = [self.embed_image(im) for im in images_np]
        embs = [e[0] for e in embs if len(e)]
        return np.stack(embs) if embs else None


def calc_faces_mean_similarity(src_list_embeds, dst_list_embeds):
    """Mean over all cross-folder image pairs of the max face-pair cosine
    (eval_utils.py:223-266). Returns (avg_sim, src_no_face, dst_no_face)."""
    src_no_face = sum(1 for e in src_list_embeds if len(e) == 0)
    dst_no_face = sum(1 for e in dst_list_embeds if len(e) == 0)
    sims = []
    for se in src_list_embeds:
        if len(se) == 0:
            continue
        for de in dst_list_embeds:
            if len(de) == 0:
                continue
            m = se @ de.T  # embeddings already normalized
            sims.append(float(m.max()))
    avg = float(np.mean(sims)) if sims else 0.0
    return avg, src_no_face, dst_no_face


def compare_face_folders(evaluator: FaceSimilarityEvaluator, src_path: str,
                         dst_path: str, src_num_samples: int = -1,
                         dst_num_samples: int = -1):
    """compare_face_folders_fast equivalent. Returns
    (avg_similarity, dst_normal_count, dst_no_face_count)."""
    src_paths = list_images(src_path, src_num_samples)
    dst_paths = list_images(dst_path, dst_num_samples)
    src_embeds = evaluator.embed_folder(src_paths)
    dst_embeds = evaluator.embed_folder(dst_paths)
    avg, _, dst_no_face = calc_faces_mean_similarity(src_embeds, dst_embeds)
    return avg, len(dst_paths) - dst_no_face, dst_no_face
