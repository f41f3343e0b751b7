"""RetinaFace port tests (models/retinaface).

No pretrained weights exist in this environment, so the pretrained-parity
leg is asset-gated (the day `Resnet50_Final.pth` appears,
tools/face_detect_validate.py --engine retinaface validates on real
photos). What IS proven here:

  * anchors/decode/NMS match the published SSD-style RetinaFace math on
    hand-computed cases (the pure-function layer where porting bugs live),
  * the torch-layout state-dict mapping is complete and the folded
    conv+BN forward matches torch.nn.functional eval-mode BN numerics,
  * the full forward produces the exact per-level anchor counts and the
    detect->align chain runs end-to-end on random weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaprompt_tpu.models import retinaface as rf


def test_priors_counts_and_values():
    h = w = 64
    pri = rf.priors(h, w)
    # levels: 8->8x8 cells, 16->4x4, 32->2x2; 2 anchors each
    assert pri.shape == (8 * 8 * 2 + 4 * 4 * 2 + 2 * 2 * 2, 4)
    # first cell of stride-8 level: center (0.5*8/64), sizes 16/64, 32/64
    np.testing.assert_allclose(pri[0], [0.0625, 0.0625, 0.25, 0.25])
    np.testing.assert_allclose(pri[1], [0.0625, 0.0625, 0.5, 0.5])
    # second anchor column moves cx by stride/w
    np.testing.assert_allclose(pri[2, 0], 0.0625 + 8 / 64)


def test_decode_zero_loc_is_prior():
    pri = np.array([[0.5, 0.5, 0.2, 0.4]], np.float32)
    boxes = rf.decode_boxes(np.zeros((1, 4), np.float32), pri)
    np.testing.assert_allclose(boxes, [[0.4, 0.3, 0.6, 0.7]], atol=1e-6)
    landms = rf.decode_landms(np.zeros((1, 10), np.float32), pri)
    np.testing.assert_allclose(landms, np.full((1, 5, 2), 0.5), atol=1e-6)


def test_decode_displacement_math():
    pri = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    loc = np.array([[1.0, -1.0, np.log(2.0) / 0.2, 0.0]], np.float32)
    b = rf.decode_boxes(loc, pri, variances=(0.1, 0.2))
    # cx = .5 + 1*.1*.2 = .52 ; cy = .48 ; w = .2*exp(log2) = .4 ; h = .2
    np.testing.assert_allclose(b, [[0.32, 0.38, 0.72, 0.58]], atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = rf.nms(boxes, scores, iou_thresh=0.4)
    assert keep == [0, 2]


def test_conv_bn_folding_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    g = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    m = rng.standard_normal(8).astype(np.float32)
    v = rng.random(8).astype(np.float32) + 0.5
    sd = {"c.weight": w, "bn.weight": g, "bn.bias": b,
          "bn.running_mean": m, "bn.running_var": v}
    p = rf._conv_bn(sd, "c", "bn", jnp.float32)
    x = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
    got = np.asarray(rf._cbr(p, jnp.asarray(x), stride=1, relu=False))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = torch.nn.functional.conv2d(xt, torch.from_numpy(w), padding=1)
    yt = torch.nn.functional.batch_norm(
        yt, torch.from_numpy(m), torch.from_numpy(v),
        torch.from_numpy(g), torch.from_numpy(b), training=False, eps=1e-5)
    want = yt.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def params():
    return rf.init_params(jax.random.PRNGKey(0))


def test_forward_anchor_counts(params):
    size = 128
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    logits, loc, ldm = rf.forward(params, x)
    n = sum(((size + s - 1) // s) ** 2 * 2 for s in (8, 16, 32))
    assert logits.shape == (1, n, 2)
    assert loc.shape == (1, n, 4)
    assert ldm.shape == (1, n, 10)


def test_detect_chain_runs(params):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (200, 160, 3), dtype=np.uint8)
    boxes, scores, landms = rf.detect_faces(params, img, det_size=128,
                                            score_thresh=0.5)
    assert boxes.shape[0] == scores.shape[0] == landms.shape[0]
    if len(boxes):
        assert (boxes[:, 0] <= 160).all() and (boxes[:, 1] <= 200).all()


def test_detector_protocol(params):
    """make_retinaface_detector returns aligned 112x112 crops (or []) —
    the FaceSimilarityEvaluator detector contract."""
    from adaprompt_tpu.eval.face_detect import make_retinaface_detector
    det = make_retinaface_detector(params, score_thresh=0.0)
    rng = np.random.default_rng(1)
    crops = det(rng.integers(0, 255, (160, 160, 3), dtype=np.uint8))
    assert isinstance(crops, list)
    for c in crops:
        assert c.shape == (112, 112, 3)
