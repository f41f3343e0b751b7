"""Face-dataset curation tools.

Roles of /root/reference/scripts-private/{comparefaces.py, filter_faces.py,
knn-faces.py}: pairwise folder identity comparison, outlier filtering
against a folder's mean ArcFace embedding, and nearest-neighbor queries.

Usage: python -m adaprompt_tpu.cli.face_tools <compare|filter|knn> ...
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import jax


def _evaluator(arcface_ckpt):
    from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator
    from adaprompt_tpu.models import arcface
    params = arcface.init_params(jax.random.PRNGKey(2))
    if arcface_ckpt:
        from adaprompt_tpu.utils.torch_port import load_state_dict
        params = arcface.from_torch(load_state_dict(arcface_ckpt))
    return FaceSimilarityEvaluator(params)


def cmd_compare(args):
    from adaprompt_tpu.eval.face_eval import compare_face_folders
    ev = _evaluator(args.arcface_ckpt)
    avg, n_ok, n_nf = compare_face_folders(ev, args.src, args.dst)
    print(f"avg face sim: {avg:.3f}  ({n_ok} scored, {n_nf} faceless)")


def cmd_filter(args):
    from adaprompt_tpu.eval.face_eval import list_images
    ev = _evaluator(args.arcface_ckpt)
    paths = list_images(args.folder)
    embs = ev.embed_folder(paths)
    valid = [(p, e[0]) for p, e in zip(paths, embs) if len(e)]
    if not valid:
        print("no faces found")
        return
    mat = np.stack([e for _, e in valid])
    mean = mat.mean(axis=0)
    mean /= np.linalg.norm(mean)
    sims = mat @ mean
    os.makedirs(args.reject_dir, exist_ok=True)
    n_rej = 0
    for (p, _), s in zip(valid, sims):
        if s < args.threshold:
            shutil.move(p, os.path.join(args.reject_dir, os.path.basename(p)))
            n_rej += 1
            print(f"rejected {os.path.basename(p)} (sim {s:.3f})")
    print(f"{n_rej}/{len(valid)} images below threshold {args.threshold}")


def cmd_knn(args):
    from adaprompt_tpu.eval.face_eval import list_images
    ev = _evaluator(args.arcface_ckpt)
    q = ev.embed_folder([args.query])[0]
    if len(q) == 0:
        print("no face in query")
        return
    paths = list_images(args.folder)
    embs = ev.embed_folder(paths)
    scored = [(float(q[0] @ e[0]), p) for p, e in zip(paths, embs) if len(e)]
    for s, p in sorted(scored, reverse=True)[: args.k]:
        print(f"{s:.3f}  {p}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arcface_ckpt", type=str, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("compare")
    pc.add_argument("src")
    pc.add_argument("dst")
    pf = sub.add_parser("filter")
    pf.add_argument("folder")
    pf.add_argument("--threshold", type=float, default=0.5)
    pf.add_argument("--reject_dir", type=str, default="rejected")
    pk = sub.add_parser("knn")
    pk.add_argument("query")
    pk.add_argument("folder")
    pk.add_argument("--k", type=int, default=5)
    args = p.parse_args(argv)
    {"compare": cmd_compare, "filter": cmd_filter, "knn": cmd_knn}[args.cmd](args)


if __name__ == "__main__":
    main()
