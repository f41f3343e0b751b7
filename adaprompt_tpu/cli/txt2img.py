"""Research-path txt2img CLI.

Role of /root/reference/scripts/stable_txt2img.py: load SD + an AdaFace
checkpoint, extract zero-shot features from reference photos, splice subject
embeddings, run DDIM with annealed CFG, save a grid, optionally score
CLIP/DINO/face similarity against the reference folder.

Usage:
  python -m adaprompt_tpu.cli.txt2img --prompt "a z riding a bike" \
      --adaface_ckpt runs/embeddings_gs-1000.npz --ref_images subjects/alice \
      --n_samples 4 --scale 4 1 --outdir out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface import arc2face as a2f
from adaprompt_tpu.adaface import checkpoint as ckpt_mod
from adaprompt_tpu.adaface import conditioner as cond_mod
from adaprompt_tpu.adaface import subj_basis_generator as sbg
from adaprompt_tpu.cli import common
from adaprompt_tpu.pipeline import DEFAULT_NEGATIVE_PROMPT


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    common.add_model_args(p)
    p.add_argument("--prompt", type=str, default="a photo of a z")
    p.add_argument("--from_file", type=str, default=None,
                   help="file with one prompt per line")
    p.add_argument("--adaface_ckpt", type=str, default=None,
                   help=".npz (native) or embeddings_gs-*.pt (reference)")
    p.add_argument("--ref_images", type=str, default=None,
                   help="folder of subject photos")
    p.add_argument("--subject_string", type=str, default="z")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=("ddim", "dpmpp"),
                   help="ddim = reference semantics; dpmpp = "
                        "DPM-Solver++(2M), ~20-25 steps match DDIM-50 "
                        "(pass a smaller --ddim_steps)")
    p.add_argument("--scale", type=float, nargs="+", default=[4.0, 1.0])
    p.add_argument("--compel_cfg_weight_level", type=float, default=0.0,
                   help="compel-style prompt weighting: push the cond "
                        "embeddings away from the empty-prompt embeddings "
                        "by 1.1**level (prob_apply_compel_cfg, "
                        "ldm/util.py:1825-1857); 0 disables")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--outdir", type=str, default="outputs/txt2img")
    p.add_argument("--neg_prompt", type=str, default=DEFAULT_NEGATIVE_PROMPT)
    p.add_argument("--clip_skip_weights", type=float, nargs="+", default=[1.0, 1.0])
    p.add_argument("--compare_with", type=str, default=None,
                   help="score generations against this folder (CLIP/DINO)")
    p.add_argument("--calc_face_sim", action="store_true")
    p.add_argument("--arcface_ckpt", type=str, default=None)
    return p.parse_args(argv)


def load_subj_basis(args, pipe):
    """Load the SubjBasisGenerator from a native or reference checkpoint."""
    scfg = sbg.SubjBasisConfig(placeholder_is_bg=False,
                               text_cfg=pipe.text_cfg)
    if args.adaface_ckpt is None:
        print("WARNING: no adaface ckpt — random SubjBasisGenerator.")
        return sbg.init_params(jax.random.PRNGKey(1), scfg), scfg
    if args.adaface_ckpt.endswith(".npz"):
        trees, meta = ckpt_mod.load_checkpoint(args.adaface_ckpt)
        return trees["subj_basis"], scfg
    ref = ckpt_mod.load_reference_checkpoint(args.adaface_ckpt)
    sd = ref["subj_basis_generators"][args.subject_string]
    return sbg.from_torch(sd, scfg), scfg


def main(argv=None):
    args = parse_args(argv)
    # validate cheap inputs BEFORE loading models
    if args.ddim_steps < 1:
        raise SystemExit(f"--ddim_steps must be >= 1, got {args.ddim_steps}")
    if args.n_samples < 1:
        raise SystemExit(f"--n_samples must be >= 1, got {args.n_samples}")
    prompts = [args.prompt]
    if args.from_file:
        if not os.path.isfile(args.from_file):
            raise SystemExit(f"--from_file not found: {args.from_file}")
        with open(args.from_file) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
        if not prompts:
            raise SystemExit(f"no prompts in {args.from_file}")
    if args.ref_images and not os.path.isdir(args.ref_images):
        raise SystemExit(f"--ref_images folder not found: {args.ref_images}")

    pipe = common.load_pipeline(args)
    sbg_params, scfg = load_subj_basis(args, pipe)

    # zero-shot ID embedding from reference photos (or random)
    rng = np.random.default_rng(args.seed)
    faceid = None
    if args.ref_images:
        try:
            from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator, list_images
            from adaprompt_tpu.models import arcface
            if args.arcface_ckpt:
                from adaprompt_tpu.utils.torch_port import load_state_dict
                af_params = arcface.from_torch(load_state_dict(args.arcface_ckpt))
            else:
                af_params = arcface.init_params(jax.random.PRNGKey(2))
            fe = FaceSimilarityEvaluator(af_params)
            embs = fe.embed_folder(list_images(args.ref_images))
            embs = [e[0] for e in embs if len(e)]
            if embs:
                m = np.mean(np.stack(embs), axis=0, keepdims=True)
                faceid = m / np.linalg.norm(m, axis=-1, keepdims=True)
        except Exception as e:  # pragma: no cover
            print(f"face embedding failed ({e}); using random face")
    if faceid is None:
        faceid = rng.standard_normal((1, 512)).astype(np.float32)
        faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)

    _, core_id = a2f.forward_face_embs(pipe.params.text, pipe.tokenizer,
                                       jnp.asarray(faceid),
                                       text_cfg=pipe.text_cfg,
                                       input_max_length=22)
    subj_embs, _ = sbg.forward(sbg_params, scfg, pipe.tokenizer, core_id,
                               is_training=False)

    specs = cond_mod.make_placeholders(pipe.tokenizer, (args.subject_string,),
                                       (), num_vectors_subj=scfg.num_out_embs_per_layer)
    pc = cond_mod.PromptConditioner(pipe.params.text, pipe.tokenizer, specs,
                                    pipe.text_cfg)

    sw = tuple(args.clip_skip_weights)
    all_paths = []
    empty_ctx = None
    if args.compel_cfg_weight_level:
        empty_ctx = pc([""] * args.n_samples, {}, skip_weights=sw)
    for pi, prompt in enumerate(prompts):
        cond = pc([prompt] * args.n_samples, {args.subject_string: subj_embs},
                  skip_weights=sw)
        if empty_ctx is not None:
            from adaprompt_tpu.adaface.compel_cfg import apply_compel_cfg
            cond = apply_compel_cfg(cond, empty_ctx,
                                    args.compel_cfg_weight_level)
        uncond = pc([args.neg_prompt] * args.n_samples, {}, skip_weights=sw)
        imgs = pipe.generate(None, context=cond, context_uncond=uncond,
                             num_steps=args.ddim_steps,
                             guidance_scale=tuple(args.scale) if len(args.scale) > 1 else args.scale[0],
                             height=args.H, width=args.W, seed=args.seed + pi,
                             sampler=args.sampler)
        all_paths += common.save_images(imgs, args.outdir, prefix=f"p{pi:03d}")
    print(f"saved {len(all_paths)} images to {args.outdir}")

    if args.compare_with:
        from adaprompt_tpu.eval.clip_scorer import CLIPScorer
        from adaprompt_tpu.eval.dino_eval import DINOEvaluator
        from adaprompt_tpu.eval import harness
        from adaprompt_tpu.models import dino as dino_mod
        scorer = CLIPScorer.random_init(0, tokenizer=pipe.tokenizer)
        dev = DINOEvaluator(dino_mod.init_params(jax.random.PRNGKey(3)))
        scores = harness.compare_folders(scorer, dev, args.compare_with,
                                         args.outdir, prompts[0])
        print(f"sim_img={scores.sim_img:.3f} sim_text={scores.sim_text:.3f} "
              f"sim_dino={scores.sim_dino:.3f}")
    return all_paths


if __name__ == "__main__":
    main()
