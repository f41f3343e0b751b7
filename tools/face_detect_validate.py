"""Validate the parsing-based face detector on REAL photos (asset-gated).

VERDICT r3 #6: the BiSeNet-parsing detector (eval/face_detect.py) replaces
the reference's insightface RetinaFace stack (adaface/util.py:242-341).
Its alignment math is already pinned to insightface's norm_crop semantics
by unit tests (tests/test_face_detect.py: Umeyama fit == independent
closed-form fit == exact template recovery; warp == cv2.warpAffine; the
mouth-centroid collapse is bias-free). What those tests cannot cover is
landmark PLACEMENT on real faces — parsing centroids vs RetinaFace's
regressed keypoints. This tool measures that, given the weight assets:

  required: --bisenet_ckpt (or $ADAPROMPT_BISENET_CKPT)  79999_iter.pth
            --photos   folder of per-subject folders of face photos
                       (e.g. the reference's subjects-celebrity layout)
  optional: --arcface_onnx  ArcFace recognition weights -> identity-level
            metrics; insightface importable -> direct landmark comparison

Reported per detector (parsing-aligned vs margined-bbox fallback vs plain
center crop):
  * detection rate (photos with >= 1 face found),
  * with --arcface_onnx: mean INTRA-SUBJECT ArcFace cosine — the metric
    that matters downstream: better detection/alignment => the same
    person's photos embed closer together (the reference's own eval
    protocol is built on these cosines, eval_utils.py:268-335),
  * with insightface installed: mean landmark L2 (px at 112) and mean
    ArcFace cosine between our aligned crop and norm_crop's, per photo.

Usage: python tools/face_detect_validate.py --photos <dir> \
           --bisenet_ckpt 79999_iter.pth [--arcface_onnx glintr100.onnx]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def subject_folders(root, max_subjects):
    subs = [os.path.join(root, d) for d in sorted(os.listdir(root))
            if os.path.isdir(os.path.join(root, d))]
    return subs[:max_subjects] if max_subjects > 0 else subs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--photos", required=True,
                    help="folder of per-subject photo folders")
    ap.add_argument("--bisenet_ckpt",
                    default=os.environ.get("ADAPROMPT_BISENET_CKPT"))
    ap.add_argument("--retinaface_ckpt",
                    default=os.environ.get("ADAPROMPT_RETINAFACE_CKPT"),
                    help="Resnet50_Final.pth or .onnx -> also validate the "
                         "JAX RetinaFace port (models/retinaface) on the "
                         "same photos (round-4 verdict item 7)")
    ap.add_argument("--arcface_onnx",
                    default=os.environ.get("ADAPROMPT_ARCFACE_ONNX"))
    ap.add_argument("--max_subjects", type=int, default=8)
    ap.add_argument("--max_photos", type=int, default=6,
                    help="photos per subject")
    args = ap.parse_args()

    if not args.bisenet_ckpt or not os.path.exists(args.bisenet_ckpt):
        raise SystemExit("BiSeNet weights required (--bisenet_ckpt / "
                         "$ADAPROMPT_BISENET_CKPT) — this validation is "
                         "asset-gated; see the module docstring")

    from PIL import Image

    from adaprompt_tpu.eval import face_detect as fd
    from adaprompt_tpu.eval.face_eval import (center_crop_detector,
                                              list_images)
    from adaprompt_tpu.models import bisenet

    from adaprompt_tpu.utils.torch_port import load_state_dict
    bn_params = bisenet.from_torch(load_state_dict(args.bisenet_ckpt))
    parsing_detect = fd.make_bisenet_detector(bn_params)

    def bbox_only_detect(image_np):
        """Ablation: same parsing bboxes, NO landmark alignment."""
        image_np = np.asarray(image_np)
        h, w = image_np.shape[:2]
        idy = (np.arange(512) * (h / 512)).astype(np.int64)
        idx = (np.arange(512) * (w / 512)).astype(np.int64)
        parsing = np.asarray(bisenet.parse_faces(
            bn_params, image_np[idy][:, idx][None]))[0]
        sy, sx = h / 512, w / 512
        crops = []
        for y0, x0, y1, x1 in fd.face_components(parsing)[:4]:
            bb = (int(y0 * sy), int(x0 * sx), int(y1 * sy), int(x1 * sx))
            c = fd.crop_square(image_np, bb, 112)
            if c is not None:
                crops.append(c)
        return crops

    detectors = {"parsing+align": parsing_detect,
                 "parsing-bbox": bbox_only_detect,
                 "center-crop": center_crop_detector}
    if args.retinaface_ckpt and os.path.exists(args.retinaface_ckpt):
        from adaprompt_tpu.models import retinaface as rf_mod
        rf_params = (rf_mod.from_onnx(args.retinaface_ckpt)
                     if args.retinaface_ckpt.endswith(".onnx")
                     else rf_mod.from_torch(
                         load_state_dict(args.retinaface_ckpt)))
        detectors["retinaface"] = fd.make_retinaface_detector(rf_params)
        log("retinaface port loaded: included in the comparison")

    evaluator = None
    if args.arcface_onnx and os.path.exists(args.arcface_onnx):
        from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator
        from adaprompt_tpu.models import arcface
        params = arcface.from_onnx(args.arcface_onnx)
        evaluator = {n: FaceSimilarityEvaluator(params, detector=d)
                     for n, d in detectors.items()}

    try:
        from insightface.app import FaceAnalysis
        face_app = FaceAnalysis(name="antelopev2",
                                providers=["CPUExecutionProvider"])
        face_app.prepare(ctx_id=-1, det_size=(512, 512))
        log("insightface available: direct landmark comparison ON")
    except Exception as e:
        face_app = None
        log(f"insightface not available ({e!r}): identity-level metrics only")

    stats = {n: dict(images=0, detected=0) for n in detectors}
    intra = {n: [] for n in detectors}
    lmk_l2, crop_cos = [], []

    for sub in subject_folders(args.photos, args.max_subjects):
        paths = list_images(sub)[:args.max_photos]
        if len(paths) < 2:
            continue
        embs = {n: [] for n in detectors}
        for p in paths:
            img = np.asarray(Image.open(p).convert("RGB"))
            for name, det in detectors.items():
                crops = det(img)
                stats[name]["images"] += 1
                if crops:
                    stats[name]["detected"] += 1
                if evaluator and crops:
                    e = evaluator[name].embed_image(img)
                    if len(e):
                        embs[name].append(e[0])
            if face_app is not None:
                infos = face_app.get(img[:, :, ::-1])
                crops_ours = parsing_detect(img)
                if infos and crops_ours:
                    info = max(infos, key=lambda x: (x["bbox"][2] - x["bbox"][0])
                               * (x["bbox"][3] - x["bbox"][1]))
                    kps = np.asarray(info["kps"], np.float32)
                    ours5 = None
                    # recompute our landmarks at image scale for the delta
                    h, w = img.shape[:2]
                    idy = (np.arange(512) * (h / 512)).astype(np.int64)
                    idx = (np.arange(512) * (w / 512)).astype(np.int64)
                    parsing = np.asarray(bisenet.parse_faces(
                        bn_params, img[idy][:, idx][None]))[0]
                    boxes = fd.face_components(parsing)
                    if boxes:
                        pts = fd.landmarks_from_parsing(parsing, boxes[0])
                        if pts is not None:
                            ours5 = pts * np.array([[w / 512, h / 512]])
                    if ours5 is not None:
                        # compare in template space (112px units)
                        M = fd.umeyama_similarity(kps, fd.ARCFACE_TEMPLATE)
                        a = ours5 @ M[:, :2].T + M[:, 2]
                        b = kps @ M[:, :2].T + M[:, 2]
                        lmk_l2.append(float(np.linalg.norm(a - b, axis=1)
                                            [[0, 1, 3]].mean()))
                    if evaluator:
                        from insightface.utils import face_align
                        ref_crop = face_align.norm_crop(img, kps)
                        ev = evaluator["parsing+align"]
                        ea = ev.embed_image(img)
                        x = ev._af.preprocess(ref_crop[None])
                        eb = np.asarray(ev._fwd(ev.params, x))
                        eb = eb / np.linalg.norm(eb, axis=-1, keepdims=True)
                        if len(ea):
                            crop_cos.append(float(ea[0] @ eb[0]))
        for name in detectors:
            e = embs[name]
            for i in range(len(e)):
                for j in range(i + 1, len(e)):
                    intra[name].append(float(e[i] @ e[j]))

    print(f"{'detector':16s} {'det-rate':>9s} {'intra-subject cos':>18s}")
    for name in detectors:
        s = stats[name]
        rate = s["detected"] / max(s["images"], 1)
        ic = (f"{np.mean(intra[name]):.4f} (n={len(intra[name])})"
              if intra[name] else "n/a")
        print(f"{name:16s} {rate:9.3f} {ic:>18s}")
    if lmk_l2:
        print(f"landmark L2 vs RetinaFace (112px space): "
              f"mean {np.mean(lmk_l2):.2f} px (n={len(lmk_l2)})")
    if crop_cos:
        print(f"crop ArcFace cosine ours-vs-norm_crop: "
              f"mean {np.mean(crop_cos):.4f} (n={len(crop_cos)})")


if __name__ == "__main__":
    main()
