"""Parsing-based face detection + alignment (no external detector deps).

The reference detects and aligns faces with insightface RetinaFace
(/root/reference/adaface/util.py:242-341, ldm ddpm.py:2344-2358). That
stack (onnxruntime) is unavailable here; instead we derive detection AND
5-point-free alignment from the BiSeNet face parser the repo already has
(models/bisenet, public 79999_iter.pth weights):

  1. parse the image at 512x512 -> 19-class per-pixel labels;
  2. face region = classes 1..13 (skin, brows, eyes, glasses, ears, nose,
     lips); connected components -> one bbox per face, largest first;
  3. landmarks from part centroids (left/right eye, nose, mouth) -> Umeyama
     similarity transform onto the standard ArcFace 112x112 template
     (the same template insightface's norm_crop uses);
  4. fallback to a margined square bbox crop when parts are occluded.

The parse function is injectable, so unit tests exercise detection,
landmarks and alignment with synthetic parsing maps (no weights needed).

Accuracy statement vs insightface (what is PROVEN vs DEFERRED):
  * proven by tests/test_face_detect.py — given the same 5 landmarks our
    crop equals insightface's norm_crop: `umeyama_similarity` matches an
    independently-derived closed-form similarity fit to float64-SVD noise
    and recovers pure-similarity landmark placements exactly;
    `warp_affine` uses (or numerically matches) the same cv2.warpAffine
    call norm_crop makes; collapsing the two mouth corners to the parsing
    centroid introduces ZERO alignment bias for similarity-placed faces
    (the opposite corner residuals cancel in the least squares — tested).
  * deferred until weights exist (asset-gated tools/face_detect_validate.py):
    landmark PLACEMENT deltas of parsing centroids vs RetinaFace's
    regressed keypoints on real photos, and the downstream intra-subject
    ArcFace-cosine comparison across detectors. Until that runs, face-sim
    evals inherit whatever placement bias the parser has.
"""

from __future__ import annotations

import numpy as np

# zllrunning face-parsing.PyTorch class ids
CLS_SKIN, CLS_L_BROW, CLS_R_BROW = 1, 2, 3
CLS_L_EYE, CLS_R_EYE, CLS_GLASSES = 4, 5, 6
CLS_L_EAR, CLS_R_EAR, CLS_EAR_RING = 7, 8, 9
CLS_NOSE, CLS_MOUTH, CLS_U_LIP, CLS_L_LIP = 10, 11, 12, 13
FACE_CLASSES = tuple(range(1, 14))          # everything that is "a face"
MOUTH_CLASSES = (CLS_MOUTH, CLS_U_LIP, CLS_L_LIP)

# insightface arcface_dst template (112x112, norm_crop)
ARCFACE_TEMPLATE = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]], np.float32)   # (x, y)


def face_components(parsing: np.ndarray, min_area_frac: float = 0.002):
    """Per-face bboxes from a parsing map.

    parsing: [H, W] int labels. Returns list of (y0, x0, y1, x1) (exclusive
    upper bounds), largest area first; components below `min_area_frac` of
    the image are dropped (parsing speckle).
    """
    from scipy import ndimage
    mask = np.isin(parsing, FACE_CLASSES)
    labels, n = ndimage.label(mask)
    if n == 0:
        return []
    h, w = parsing.shape
    out = []
    for sl in ndimage.find_objects(labels):
        if sl is None:
            continue
        ys, xs = sl
        area = (ys.stop - ys.start) * (xs.stop - xs.start)
        if area < min_area_frac * h * w:
            continue
        out.append((ys.start, xs.start, ys.stop, xs.stop))
    out.sort(key=lambda b: -(b[2] - b[0]) * (b[3] - b[1]))
    return out


def _centroid(parsing, classes, bbox):
    y0, x0, y1, x1 = bbox
    sub = parsing[y0:y1, x0:x1]
    ys, xs = np.nonzero(np.isin(sub, classes))
    if len(ys) < 4:                  # too few pixels to trust
        return None
    return np.array([x0 + xs.mean(), y0 + ys.mean()], np.float32)  # (x, y)


def landmarks_from_parsing(parsing: np.ndarray, bbox):
    """5-ish landmarks (x, y) from part centroids: [l_eye, r_eye, nose,
    mouth, mouth] (mouth corners collapsed to the mouth centroid). Returns
    None when eyes or mouth are not visible. Eyes are ordered by image x so
    the parser's left/right convention cannot flip the alignment."""
    e1 = _centroid(parsing, (CLS_L_EYE,), bbox)
    e2 = _centroid(parsing, (CLS_R_EYE,), bbox)
    if e1 is None or e2 is None:
        # glasses occlude both eye classes; use the glasses region split
        g = _centroid(parsing, (CLS_GLASSES,), bbox)
        if g is None:
            return None
        y0, x0, y1, x1 = bbox
        sub = parsing[y0:y1, x0:x1]
        ys, xs = np.nonzero(sub == CLS_GLASSES)
        left = xs + x0 <= g[0]
        if left.sum() < 4 or (~left).sum() < 4:
            return None
        e1 = np.array([(xs[left] + x0).mean(), (ys[left] + y0).mean()], np.float32)
        e2 = np.array([(xs[~left] + x0).mean(), (ys[~left] + y0).mean()], np.float32)
    if e1[0] > e2[0]:
        e1, e2 = e2, e1
    nose = _centroid(parsing, (CLS_NOSE,), bbox)
    mouth = _centroid(parsing, MOUTH_CLASSES, bbox)
    if mouth is None:
        return None
    if nose is None:
        nose = (e1 + e2) / 2 * 0.5 + mouth * 0.5
    return np.stack([e1, e2, nose, mouth, mouth])


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (scale+rot+shift) src -> dst.
    src/dst: [N, 2]. Returns a 2x3 affine matrix."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    ms, md = src.mean(0), dst.mean(0)
    s0, d0 = src - ms, dst - md
    cov = d0.T @ s0 / len(src)
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt))
    diag = np.diag([1.0, d])
    var_s = (s0 ** 2).sum() / len(src)
    scale = np.trace(np.diag(s) @ diag) / (var_s + 1e-12)
    R = u @ diag @ vt
    M = np.zeros((2, 3))
    M[:, :2] = scale * R
    M[:, 2] = md - scale * R @ ms
    return M


def warp_affine(image: np.ndarray, M: np.ndarray, size: int) -> np.ndarray:
    """Bilinear warp of `image` by the 2x3 forward matrix M onto
    (size, size). Uses cv2 when importable (exactly insightface
    norm_crop's warp call), numpy otherwise (tested equivalent,
    tests/test_face_detect.py)."""
    try:
        import cv2
        return cv2.warpAffine(image, M.astype(np.float32), (size, size),
                              flags=cv2.INTER_LINEAR)
    except ImportError:
        return warp_affine_np(image, M, size)


def warp_affine_np(image: np.ndarray, M: np.ndarray, size: int) -> np.ndarray:
    """Pure-numpy warp_affine: inverse-map each output pixel."""
    A = np.eye(3)
    A[:2] = M
    Ainv = np.linalg.inv(A)
    ys, xs = np.mgrid[0:size, 0:size]
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(size * size)])
    sx, sy = (Ainv @ pts)[:2]
    h, w = image.shape[:2]
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 2)
    fx = np.clip(sx - x0, 0, 1)[:, None]
    fy = np.clip(sy - y0, 0, 1)[:, None]
    im = image.reshape(h * w, -1).astype(np.float32)
    idx = y0 * w + x0
    val = (im[idx] * (1 - fx) * (1 - fy) + im[idx + 1] * fx * (1 - fy)
           + im[idx + w] * (1 - fx) * fy + im[idx + w + 1] * fx * fy)
    out = val.reshape(size, size, -1)
    if image.ndim == 2:
        out = out[..., 0]
    return out.astype(image.dtype)


def crop_square(image: np.ndarray, bbox, size: int, margin: float = 0.3):
    """Margined square bbox crop resized to (size, size) — the alignment
    fallback (and what the center-crop detector effectively does)."""
    h, w = image.shape[:2]
    y0, x0, y1, x1 = bbox
    cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
    half = max(y1 - y0, x1 - x0) * (1 + 2 * margin) / 2
    yy0, yy1 = int(max(cy - half, 0)), int(min(cy + half, h))
    xx0, xx1 = int(max(cx - half, 0)), int(min(cx + half, w))
    crop = image[yy0:yy1, xx0:xx1]
    if crop.size == 0:
        return None
    idy = np.clip((np.arange(size) * (crop.shape[0] / size)), 0,
                  crop.shape[0] - 1).astype(np.int64)
    idx = np.clip((np.arange(size) * (crop.shape[1] / size)), 0,
                  crop.shape[1] - 1).astype(np.int64)
    return crop[idy][:, idx]


def make_parsing_detector(parse_fn, size: int = 112, parse_size: int = 512,
                          max_faces: int = 4):
    """Build a detector from a parsing callable.

    parse_fn: uint8 [B, parse_size, parse_size, 3] -> labels
      [B, parse_size, parse_size] (e.g. functools.partial of
      bisenet.parse_faces with loaded params).
    Returns detect(image_np) -> list of aligned [size, size, 3] uint8
    crops, largest face first (the detector protocol of
    eval.face_eval.FaceSimilarityEvaluator).
    """
    def detect(image_np: np.ndarray):
        image_np = np.asarray(image_np)
        h, w = image_np.shape[:2]
        # nearest-resize to the parser's native resolution
        idy = (np.arange(parse_size) * (h / parse_size)).astype(np.int64)
        idx = (np.arange(parse_size) * (w / parse_size)).astype(np.int64)
        small = image_np[idy][:, idx]
        parsing = np.asarray(parse_fn(small[None]))[0]
        sy, sx = h / parse_size, w / parse_size

        crops = []
        for bbox in face_components(parsing)[:max_faces]:
            pts = landmarks_from_parsing(parsing, bbox)
            if pts is not None:
                # landmarks live in parse-space; map to image space
                pts_img = pts * np.array([[sx, sy]], np.float32)
                M = umeyama_similarity(pts_img, ARCFACE_TEMPLATE)
                crops.append(warp_affine(image_np, M, size))
            else:
                y0, x0, y1, x1 = bbox
                bb = (int(y0 * sy), int(x0 * sx), int(y1 * sy), int(x1 * sx))
                crop = crop_square(image_np, bb, size)
                if crop is not None:
                    crops.append(crop)
        return crops

    return detect


def make_bisenet_detector(bisenet_params, size: int = 112, cfg=None):
    """Detector backed by the JAX BiSeNet parser (models/bisenet)."""
    import functools
    from adaprompt_tpu.models import bisenet
    parse = functools.partial(bisenet.parse_faces, bisenet_params,
                              cfg=cfg or bisenet.BISENET_FACE)
    return make_parsing_detector(parse, size=size)


def make_retinaface_detector(rf_params, size: int = 112, cfg=None,
                             score_thresh: float = 0.5, max_faces: int = 4):
    """Detector backed by the JAX RetinaFace port (models/retinaface) —
    the reference's actual detection semantics (regressed 5-point landmarks
    -> norm_crop alignment; adaface/util.py:242-341, eval_utils.py:268-335
    deepface-retinaface engine). Removes the parsing-centroid landmark
    caveat of the BiSeNet detector entirely: the landmarks here are the
    model's own keypoint regressions, exactly what insightface feeds
    norm_crop."""
    from adaprompt_tpu.models import retinaface as rf

    def detect(image_np: np.ndarray):
        image_np = np.asarray(image_np)
        boxes, scores, landms = rf.detect_faces(
            rf_params, image_np, cfg or rf.RETINAFACE_R50,
            score_thresh=score_thresh)
        crops = []
        for i in range(min(len(scores), max_faces)):
            M = umeyama_similarity(landms[i].astype(np.float32),
                                   ARCFACE_TEMPLATE)
            crops.append(warp_affine(image_np, M, size))
        return crops

    return detect
