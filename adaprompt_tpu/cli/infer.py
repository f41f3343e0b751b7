"""Product-path inference CLI — role of /root/reference/adaface/adaface-infer.py:
photos of one subject in -> personalized txt2img grid out, via the
AdaFacePipeline public API (token-table update + prompt rewrite)."""

from __future__ import annotations

import argparse

import jax

from adaprompt_tpu.cli import common
from adaprompt_tpu.cli.txt2img import load_subj_basis


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    common.add_model_args(p)
    p.add_argument("--subject", type=str, required=True,
                   help="folder of subject photos")
    p.add_argument("--prompt", type=str, default="portrait of a z")
    p.add_argument("--adaface_ckpt", type=str, default=None)
    p.add_argument("--subject_string", type=str, default="z")
    p.add_argument("--out_image_count", type=int, default=4)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=("ddim", "dpmpp"),
                   help="dpmpp = DPM-Solver++(2M); ~20-25 steps match "
                        "DDIM-50 (pass a smaller --num_steps)")
    p.add_argument("--guidance_scale", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--noise_level", type=float, default=0.0)
    p.add_argument("--outdir", type=str, default="outputs/infer")
    p.add_argument("--arcface_ckpt", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    pipe = common.load_pipeline(args)
    sbg_params, scfg = load_subj_basis(args, pipe)

    from adaprompt_tpu.adaface.wrapper import AdaFacePipeline
    from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator, list_images
    from adaprompt_tpu.models import arcface

    if args.arcface_ckpt:
        from adaprompt_tpu.utils.torch_port import load_state_dict
        af_params = arcface.from_torch(load_state_dict(args.arcface_ckpt))
    else:
        af_params = arcface.init_params(jax.random.PRNGKey(2))
    face_embedder = FaceSimilarityEvaluator(af_params)

    ada = AdaFacePipeline(pipe, sbg_params, scfg, pipe.params.text,
                          pipe.text_cfg, face_embedder=face_embedder,
                          subject_string=args.subject_string,
                          num_inference_steps=args.num_steps)
    subj_embs = ada.generate_adaface_embeddings(
        image_paths=list_images(args.subject), noise_level=args.noise_level,
        seed=args.seed)
    if subj_embs is None:
        raise SystemExit("no usable face embeddings extracted")

    imgs = ada(args.prompt, guidance_scale=args.guidance_scale,
               out_image_count=args.out_image_count, seed=args.seed,
               sampler=args.sampler)
    paths = common.save_images(imgs, args.outdir)
    print(f"saved {len(paths)} images to {args.outdir}")
    return paths


if __name__ == "__main__":
    main()
