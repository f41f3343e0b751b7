"""img2img "translation" CLI — role of
/root/reference/adaface/adaface-translate.py: bulk-personalize a folder of
face images by re-denoising them from `ref_img_strength` with the subject's
AdaFace conditioning (DDIM stochastic_encode/decode)."""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from adaprompt_tpu.cli import common
from adaprompt_tpu.cli.txt2img import load_subj_basis
from adaprompt_tpu.sampling import ddim
from adaprompt_tpu.models import unet as unet_mod


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    common.add_model_args(p)
    p.add_argument("--in_folder", type=str, required=True)
    p.add_argument("--subject", type=str, default=None,
                   help="photos for ID extraction (default: in_folder)")
    p.add_argument("--prompt", type=str, default="portrait of a z")
    p.add_argument("--adaface_ckpt", type=str, default=None)
    p.add_argument("--subject_string", type=str, default="z")
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--ref_img_strength", type=float, default=0.8)
    p.add_argument("--guidance_scale", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--outdir", type=str, default="outputs/translate")
    p.add_argument("--arcface_ckpt", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    pipe = common.load_pipeline(args)
    sbg_params, scfg = load_subj_basis(args, pipe)

    from adaprompt_tpu.adaface.wrapper import AdaFacePipeline
    from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator, list_images
    from adaprompt_tpu.models import arcface

    af_params = arcface.init_params(jax.random.PRNGKey(2))
    if args.arcface_ckpt:
        from adaprompt_tpu.utils.torch_port import load_state_dict
        af_params = arcface.from_torch(load_state_dict(args.arcface_ckpt))
    ada = AdaFacePipeline(pipe, sbg_params, scfg, pipe.params.text,
                          pipe.text_cfg,
                          face_embedder=FaceSimilarityEvaluator(af_params),
                          subject_string=args.subject_string)
    ada.generate_adaface_embeddings(
        image_paths=list_images(args.subject or args.in_folder), seed=args.seed)

    cond, uncond = ada.encode_prompt(args.prompt)
    t_start = int(args.num_steps * args.ref_img_strength)

    paths = list_images(args.in_folder)
    os.makedirs(args.outdir, exist_ok=True)
    from adaprompt_tpu.sampling.ddim import guidance_schedule  # noqa: F401
    for i, path in enumerate(paths):
        img = Image.open(path).convert("RGB").resize((512, 512), Image.BICUBIC)
        x = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
        z0 = pipe.encode_image(x)
        key = jax.random.PRNGKey(args.seed + i)
        z_t = ddim.stochastic_encode(z0, jnp.asarray(t_start - 1), key,
                                     num_steps=args.num_steps)
        ctx = jnp.concatenate([cond, uncond], axis=0)[None].astype(pipe.compute_dtype)

        def model_fn(x_in, t_in):
            return unet_mod.forward(pipe.params.unet,
                                    x_in.astype(pipe.compute_dtype), t_in, ctx,
                                    cfg=pipe.unet_cfg).astype(jnp.float32)

        z = ddim.ddim_decode(model_fn, z_t, t_start, num_steps=args.num_steps,
                             guidance_scale=args.guidance_scale)
        out = pipe.decode_latents(z)[0]
        Image.fromarray(out).save(os.path.join(args.outdir, os.path.basename(path)))
    print(f"translated {len(paths)} images to {args.outdir}")


if __name__ == "__main__":
    main()
