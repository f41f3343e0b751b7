"""Parsing-based face detection/alignment (eval/face_detect.py) — synthetic
parsing maps, no BiSeNet weights needed."""

import numpy as np
import pytest

from adaprompt_tpu.eval import face_detect as fd


def _synthetic_parsing(size=512, oy=300, ox=80):
    """An off-center synthetic 'face': skin rect with eye/nose/mouth parts.
    Returns (parsing [size,size] int, part positions dict in parse coords)."""
    p = np.zeros((size, size), np.int64)
    p[oy:oy + 120, ox:ox + 120] = fd.CLS_SKIN
    parts = {}
    p[oy + 30:oy + 38, ox + 20:ox + 32] = fd.CLS_L_EYE
    parts["l_eye"] = (ox + 26, oy + 34)                     # (x, y)
    p[oy + 30:oy + 38, ox + 80:ox + 92] = fd.CLS_R_EYE
    parts["r_eye"] = (ox + 86, oy + 34)
    p[oy + 55:oy + 70, ox + 50:ox + 62] = fd.CLS_NOSE
    parts["nose"] = (ox + 56, oy + 62.5)
    p[oy + 85:oy + 95, ox + 35:ox + 80] = fd.CLS_MOUTH
    parts["mouth"] = (ox + 57.5, oy + 90)
    return p, parts


def test_face_components_finds_offcenter_face():
    parsing, _ = _synthetic_parsing()
    boxes = fd.face_components(parsing)
    assert len(boxes) == 1
    y0, x0, y1, x1 = boxes[0]
    assert (y0, x0) == (300, 80) and (y1, x1) == (420, 200)


def test_face_components_drops_speckle_keeps_two_faces():
    parsing, _ = _synthetic_parsing()
    parsing[10:60, 400:450] = fd.CLS_SKIN          # second, smaller face
    parsing[5, 5] = fd.CLS_SKIN                     # 1px speckle
    boxes = fd.face_components(parsing)
    assert len(boxes) == 2
    assert boxes[0][0] == 300                       # largest first


def test_landmarks_positions():
    parsing, parts = _synthetic_parsing()
    bbox = fd.face_components(parsing)[0]
    pts = fd.landmarks_from_parsing(parsing, bbox)
    assert pts is not None and pts.shape == (5, 2)
    np.testing.assert_allclose(pts[0], parts["l_eye"], atol=1.0)
    np.testing.assert_allclose(pts[1], parts["r_eye"], atol=1.0)
    np.testing.assert_allclose(pts[3], parts["mouth"], atol=1.0)


def test_landmarks_none_without_eyes():
    parsing, _ = _synthetic_parsing()
    parsing[(parsing == fd.CLS_L_EYE) | (parsing == fd.CLS_R_EYE)] = fd.CLS_SKIN
    bbox = fd.face_components(parsing)[0]
    assert fd.landmarks_from_parsing(parsing, bbox) is None


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(5, 2)) * 20 + 50
    theta, s, t = 0.3, 1.7, np.array([11.0, -4.0])
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    dst = s * src @ R.T + t
    M = fd.umeyama_similarity(src, dst)
    back = src @ M[:, :2].T + M[:, 2]
    np.testing.assert_allclose(back, dst, atol=1e-6)


def test_detector_aligns_offcenter_face():
    """Full path: stubbed parse_fn, 1024px image with colored eye patches —
    after detection+alignment the eyes must land on the ArcFace template
    positions (center-crop would not even contain the face region tightly)."""
    parsing, parts = _synthetic_parsing()
    image = np.full((1024, 1024, 3), 30, np.uint8)   # parse at 512: scale 2x
    # paint eye neighborhoods in the IMAGE at 2x parse coords
    lx, ly = int(parts["l_eye"][0] * 2), int(parts["l_eye"][1] * 2)
    rx, ry = int(parts["r_eye"][0] * 2), int(parts["r_eye"][1] * 2)
    image[ly - 12:ly + 12, lx - 12:lx + 12] = (255, 0, 0)
    image[ry - 12:ry + 12, rx - 12:rx + 12] = (0, 255, 0)

    detect = fd.make_parsing_detector(lambda batch: parsing[None], size=112)
    crops = detect(image)
    assert len(crops) == 1
    crop = crops[0]
    assert crop.shape == (112, 112, 3)
    tl = fd.ARCFACE_TEMPLATE[0]   # (x, y) of left eye in the 112 template
    tr = fd.ARCFACE_TEMPLATE[1]
    red = crop[int(tl[1]), int(tl[0])]
    green = crop[int(tr[1]), int(tr[0])]
    assert red[0] > 150 and red[1] < 80, red
    assert green[1] > 150 and green[0] < 80, green


def test_detector_bbox_fallback_and_no_face():
    parsing, _ = _synthetic_parsing()
    parsing[(parsing == fd.CLS_L_EYE) | (parsing == fd.CLS_R_EYE)] = fd.CLS_SKIN
    image = np.zeros((512, 512, 3), np.uint8)
    image[300:420, 80:200] = 200                     # face region bright
    detect = fd.make_parsing_detector(lambda b: parsing[None], size=112)
    crops = detect(image)
    assert len(crops) == 1                           # bbox fallback fired
    assert crops[0].mean() > 60                      # crop is face-dominated

    empty = fd.make_parsing_detector(
        lambda b: np.zeros((1, 512, 512), np.int64), size=112)
    assert empty(image) == []


def test_make_detector_spec_default_center_crop(monkeypatch):
    from adaprompt_tpu.eval import face_eval
    monkeypatch.delenv("ADAPROMPT_BISENET_CKPT", raising=False)
    assert face_eval.make_detector(None) is None
    with pytest.raises(ValueError):
        face_eval.make_detector("retina:whatever")


# ---------------------------------------------------------------------------
# insightface norm_crop semantics (VERDICT r3 #6)
#
# The reference's detection/alignment is insightface FaceAnalysis
# (adaface/util.py:242-341): RetinaFace 5-point landmarks ->
# face_align.norm_crop = skimage SimilarityTransform (Umeyama 1991) fitted
# onto the arcface_dst 112x112 template + cv2.warpAffine. Given the SAME
# five landmarks, our umeyama_similarity + warp_affine must therefore be
# numerically indistinguishable from insightface's crop. These tests pin
# that equivalence with an INDEPENDENT closed-form similarity fit and
# cv2's own warp; what they cannot pin (RetinaFace-vs-parsing landmark
# placement on real photos) is measured by tools/face_detect_validate.py
# the day BiSeNet/ArcFace weights exist.
# ---------------------------------------------------------------------------

def _similarity_fit_complex(src, dst):
    """Independent reference: 2D similarity least squares in complex form.
    dst ~ a*src + b over C minimizing sum |a s_i + b - d_i|^2 — a different
    derivation than Umeyama's SVD (valid when no reflection is needed)."""
    s = src[:, 0] + 1j * src[:, 1]
    d = dst[:, 0] + 1j * dst[:, 1]
    s0, d0 = s - s.mean(), d - d.mean()
    a = np.vdot(s0, d0) / np.vdot(s0, s0)
    b = d.mean() - a * s.mean()
    return np.array([[a.real, -a.imag, b.real],
                     [a.imag, a.real, b.imag]])


def test_umeyama_matches_independent_similarity_fit():
    """On noisy landmark-like point sets the SVD (Umeyama) and complex
    closed-form fits must agree to machine precision."""
    rng = np.random.default_rng(3)
    for _ in range(25):
        src = fd.ARCFACE_TEMPLATE + rng.normal(size=(5, 2)) * 3.0
        theta = rng.uniform(-1.2, 1.2)
        s = rng.uniform(0.4, 2.5)
        R = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
        dst = s * src @ R.T + rng.normal(size=2) * 40 \
            + rng.normal(size=(5, 2)) * 2.0   # landmark noise
        np.testing.assert_allclose(fd.umeyama_similarity(src, dst),
                                   _similarity_fit_complex(src, dst),
                                   atol=1e-9)


def test_umeyama_template_fit_matches_insightface_estimate_norm():
    """The exact call shape insightface makes: fit observed landmarks onto
    ARCFACE_TEMPLATE. Checked against the independent fit AND for exact
    template recovery when landmarks are a pure similarity of it."""
    rng = np.random.default_rng(11)
    for _ in range(10):
        theta = rng.uniform(-0.8, 0.8)
        s = rng.uniform(1.5, 6.0)           # faces are bigger than 112px
        R = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
        t = rng.uniform(50, 400, size=2)
        lmk = s * fd.ARCFACE_TEMPLATE @ R.T + t
        M = fd.umeyama_similarity(lmk, fd.ARCFACE_TEMPLATE)
        M2 = _similarity_fit_complex(lmk, fd.ARCFACE_TEMPLATE)
        # both fits map the landmarks back onto the template exactly
        # (matrix entries agree to float64-SVD noise, ~1e-6)
        np.testing.assert_allclose(M, M2, atol=1e-4)
        for mm in (M, M2):
            back = lmk @ mm[:, :2].T + mm[:, 2]
            np.testing.assert_allclose(back, fd.ARCFACE_TEMPLATE, atol=1e-4)


def test_mouth_centroid_collapse_is_unbiased():
    """Our parser yields one mouth centroid, not two corners; the detector
    feeds [e1, e2, nose, mouth, mouth] against the 5-point template. For a
    true similarity-placed face this collapse recovers the EXACT transform
    (the two opposite corner residuals cancel in the least squares), so
    alignment inherits zero bias from it."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        theta = rng.uniform(-0.6, 0.6)
        s = rng.uniform(1.0, 4.0)
        R = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
        t = rng.uniform(0, 300, size=2)
        true_pts = s * fd.ARCFACE_TEMPLATE @ R.T + t      # RetinaFace view
        mouth_c = true_pts[3:5].mean(0)                   # our parser view
        ours = np.stack([true_pts[0], true_pts[1], true_pts[2],
                         mouth_c, mouth_c])
        M = fd.umeyama_similarity(ours, fd.ARCFACE_TEMPLATE)
        M_ref = fd.umeyama_similarity(true_pts, fd.ARCFACE_TEMPLATE)
        # the collapse is a stationary point of the exact-arithmetic LSQ
        # (opposite corner residuals cancel); what remains is float64 SVD
        # noise — bound the template-space DISPLACEMENT it causes far below
        # a pixel
        disp = (true_pts @ (M - M_ref)[:, :2].T + (M - M_ref)[:, 2])
        assert np.abs(disp).max() < 1e-3, np.abs(disp).max()


def test_warp_affine_np_matches_cv2():
    """The numpy fallback warp must match cv2.warpAffine (the warp
    insightface's norm_crop uses) on a smooth image."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:200, 0:200]
    img = np.stack([(yy * 1.2 + xx * 0.3) % 256,
                    (xx * 0.9) % 256,
                    ((yy + xx) * 0.5) % 256], -1).astype(np.uint8)
    lmk = fd.ARCFACE_TEMPLATE * 1.4 + np.array([20.0, 15.0])
    M = fd.umeyama_similarity(lmk, fd.ARCFACE_TEMPLATE)
    ours = fd.warp_affine_np(img, M, 112).astype(np.float32)
    ref = cv2.warpAffine(img, M.astype(np.float32), (112, 112),
                         flags=cv2.INTER_LINEAR).astype(np.float32)
    # interior pixels (borders differ by out-of-range handling policy)
    assert np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2]).mean() < 1.0
