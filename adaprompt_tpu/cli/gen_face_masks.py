"""Training-data face-mask generation — role of
/root/reference/scripts-private/gen_face_masks.py.

Runs BiSeNet 19-class face parsing (models/bisenet, weights ported from the
public face-parsing.PyTorch `79999_iter.pth`) over subject folders at
512x512, writes the resized image plus a binary `*_mask.png` (parsing != 0),
and applies the reference's curation rules: images with <= 9 distinct parts
go to `<src>_trash/`, images with >= 18 parts go to `<src>_inspect/`
(gen_face_masks.py:141-170).

Usage:
  python -m adaprompt_tpu.cli.gen_face_masks --bisenet_ckpt 79999_iter.pth \
      --src /data/VGGface2_HQ --out /data/VGGface2_HQ_masks [--flat]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bisenet_ckpt", type=str, required=True,
                   help="face-parsing.PyTorch checkpoint (79999_iter.pth)")
    p.add_argument("--src", type=str, required=True,
                   help="root of per-subject folders (or a flat image dir "
                        "with --flat, the FFHQ case)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--flat", action="store_true",
                   help="src is a flat folder of images, no subject subdirs")
    p.add_argument("--max_imgs_per_person", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--trash_min_parts", type=int, default=9,
                   help="<= this many parts -> move to trash")
    p.add_argument("--inspect_max_parts", type=int, default=18,
                   help=">= this many parts -> move to inspect")
    p.add_argument("--move_bad", action="store_true",
                   help="actually MOVE bad source images (reference "
                        "behavior); default copies them instead")
    return p.parse_args(argv)


def _list_images(d):
    return sorted(f for f in os.listdir(d)
                  if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp"))
                  and not f.endswith("_mask.png"))


def main(argv=None):
    args = parse_args(argv)
    from PIL import Image
    import jax

    from adaprompt_tpu.models import bisenet
    from adaprompt_tpu.utils.torch_port import load_state_dict

    params = bisenet.from_torch(load_state_dict(args.bisenet_ckpt))

    src = args.src.rstrip("/\\")
    trash = src + "_trash"
    inspect = src + "_inspect"
    subj_dirs = [""] if args.flat else sorted(
        d for d in os.listdir(src) if os.path.isdir(os.path.join(src, d)))

    parts_stats: dict = {}
    n_done = 0
    for subj in subj_dirs:
        sdir = os.path.join(src, subj) if subj else src
        names = _list_images(sdir)
        if args.max_imgs_per_person > 0:
            names = names[: args.max_imgs_per_person]
        for i in range(0, len(names), args.batch_size):
            chunk = names[i:i + args.batch_size]
            imgs = []
            for name in chunk:
                im = Image.open(os.path.join(sdir, name))
                im = im.resize((512, 512), Image.BILINEAR).convert("RGB")
                imgs.append(np.asarray(im))
            parsing = bisenet.parse_faces(params, imgs)    # [b, 512, 512]
            for name, img, par in zip(chunk, imgs, parsing):
                n_parts = len(np.unique(par))
                parts_stats[n_parts] = parts_stats.get(n_parts, 0) + 1
                if n_parts <= args.trash_min_parts:
                    dst = os.path.join(trash, subj)
                elif n_parts >= args.inspect_max_parts:
                    dst = os.path.join(inspect, subj)
                else:
                    dst = None
                if dst is not None:
                    os.makedirs(dst, exist_ok=True)
                    op = shutil.move if args.move_bad else shutil.copy
                    op(os.path.join(sdir, name), os.path.join(dst, name))
                    continue
                odir = os.path.join(args.out, subj)
                os.makedirs(odir, exist_ok=True)
                Image.fromarray(img).save(os.path.join(odir, name))
                mask = ((par != 0) * 255).astype(np.uint8)
                stem = os.path.splitext(name)[0]
                Image.fromarray(mask).save(
                    os.path.join(odir, stem + "_mask.png"))
                n_done += 1
            if n_done and n_done % 100 < args.batch_size:
                print(f"{n_done} done; parts histogram: "
                      f"{dict(sorted(parts_stats.items()))}")
    print(f"wrote {n_done} image+mask pairs to {args.out}; "
          f"parts histogram: {dict(sorted(parts_stats.items()))}")


if __name__ == "__main__":
    main()
