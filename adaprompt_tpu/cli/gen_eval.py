"""Batch subject generation + evaluation CLI.

Role of /root/reference/scripts/gen_subjects_and_eval.py: iterate the
subjects of a folder tree, build per-subject prompt lists (DreamBooth /
community sets), generate images for each prompt via the product pipeline,
and aggregate CLIP/DINO/face-similarity scores into a CSV.
"""

from __future__ import annotations

import argparse
import csv
import os

import jax

from adaprompt_tpu.cli import common
from adaprompt_tpu.cli.txt2img import load_subj_basis
from adaprompt_tpu.eval.prompts import format_prompt_list


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    common.add_model_args(p)
    p.add_argument("--subjects_root", type=str, required=True)
    p.add_argument("--subjects", type=str, nargs="*", default=None)
    p.add_argument("--adaface_ckpt", type=str, default=None)
    p.add_argument("--subject_string", type=str, default="z")
    p.add_argument("--prompt_set", type=str, default="dreambench",
                   choices=["dreambench", "community", "all"])
    p.add_argument("--n_per_prompt", type=int, default=4)
    p.add_argument("--max_prompts", type=int, default=None)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--outdir", type=str, default="outputs/gen_eval")
    p.add_argument("--arcface_ckpt", type=str, default=None)
    p.add_argument("--use_fp_trick", action="store_true", default=True)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    pipe = common.load_pipeline(args)
    sbg_params, scfg = load_subj_basis(args, pipe)

    from adaprompt_tpu.adaface.wrapper import AdaFacePipeline
    from adaprompt_tpu.data.dataset import scan_subject_folders
    from adaprompt_tpu.eval.clip_scorer import CLIPScorer
    from adaprompt_tpu.eval.dino_eval import DINOEvaluator
    from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator, list_images
    from adaprompt_tpu.eval import harness
    from adaprompt_tpu.models import arcface, dino as dino_mod

    af_params = arcface.init_params(jax.random.PRNGKey(2))
    if args.arcface_ckpt:
        if args.arcface_ckpt.endswith(".onnx"):
            af_params = arcface.from_onnx(args.arcface_ckpt)
        else:
            from adaprompt_tpu.utils.torch_port import load_state_dict
            af_params = arcface.from_torch(load_state_dict(args.arcface_ckpt))
    face_embedder = FaceSimilarityEvaluator(af_params)

    scorer = CLIPScorer.random_init(0, tokenizer=pipe.tokenizer)
    dino_eval = DINOEvaluator(dino_mod.init_params(jax.random.PRNGKey(3)))

    subjects = scan_subject_folders(args.subjects_root,
                                    subject_names=args.subjects)
    rows = []
    for subj in subjects:
        ada = AdaFacePipeline(pipe, sbg_params, scfg, pipe.params.text,
                              pipe.text_cfg, face_embedder=face_embedder,
                              subject_string=args.subject_string)
        embs = ada.generate_adaface_embeddings(image_paths=subj.image_paths,
                                               seed=args.seed)
        if embs is None:
            print(f"skip {subj.name}: no face")
            continue
        prompts, short_prompts, _ = format_prompt_list(
            args.subject_string, class_token=subj.cls_delta_string,
            class_long_token=subj.cls_delta_string,
            broad_class=subj.broad_class, prompt_set_name=args.prompt_set,
            use_fp_trick=args.use_fp_trick)
        if args.max_prompts:
            prompts = prompts[: args.max_prompts]
        subj_out = os.path.join(args.outdir, subj.name)
        for pi, prompt in enumerate(prompts):
            imgs = ada(prompt, out_image_count=args.n_per_prompt,
                       num_steps=args.num_steps,
                       guidance_scale=args.guidance_scale, seed=args.seed + pi)
            common.save_images(imgs, subj_out, prefix=f"p{pi:03d}")
        scores = harness.compare_folders(scorer, dino_eval,
                                         os.path.dirname(subj.image_paths[0]),
                                         subj_out, short_prompts[0],
                                         face_evaluator=face_embedder)
        rows.append({"subject": subj.name, "sim_img": scores.sim_img,
                     "sim_text": scores.sim_text, "sim_dino": scores.sim_dino,
                     "sim_face": scores.sim_face})
        print(rows[-1])

    os.makedirs(args.outdir, exist_ok=True)
    csv_path = os.path.join(args.outdir, "scores.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["subject", "sim_img", "sim_text",
                                          "sim_dino", "sim_face"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {csv_path}")
    return rows


if __name__ == "__main__":
    main()
