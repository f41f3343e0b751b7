"""Arc2Face teacher generation CLI.

Role of /root/reference/scripts-private/arc2face_test.py (BASELINE config 3):
generate images directly from the Arc2Face teacher — ArcFace ID embedding ->
Arc2Face text-encoder prompt embeddings (max_len 21) -> DDIM with the
Arc2Face UNet. Useful for sanity-checking the teacher before distillation.
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface import arc2face as a2f
from adaprompt_tpu.cli import common
from adaprompt_tpu.models import clip_text, unet as unet_mod
from adaprompt_tpu.utils import torch_port


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    common.add_model_args(p)
    p.add_argument("--arc2face_ckpt", type=str, default=None)
    p.add_argument("--ref_images", type=str, default=None,
                   help="photos for ID extraction (random face if absent)")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--outdir", type=str, default="outputs/arc2face")
    p.add_argument("--arcface_ckpt", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    pipe = common.load_pipeline(args)

    # the Arc2Face teacher shares the SD-1.5 architecture; its weights are a
    # diffusers directory/checkpoint
    if args.arc2face_ckpt:
        sd = torch_port.load_state_dict(args.arc2face_ckpt)
        parts = torch_port.split_sd_checkpoint(sd)
        if parts["unet"]:
            pipe.params.unet = unet_mod.from_torch(parts["unet"])
            a2f_text = clip_text.from_torch(parts["text"])
        else:
            from adaprompt_tpu.utils.diffusers_port import unet_from_diffusers
            pipe.params.unet = unet_from_diffusers(sd)
            a2f_text = pipe.params.text
    else:
        print("WARNING: no arc2face ckpt — teacher = current SD weights.")
        a2f_text = pipe.params.text

    rng = np.random.default_rng(args.seed)
    faceid = None
    if args.ref_images:
        from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator, list_images
        from adaprompt_tpu.models import arcface
        af = arcface.init_params(jax.random.PRNGKey(2))
        if args.arcface_ckpt:
            af = arcface.from_torch(torch_port.load_state_dict(args.arcface_ckpt))
        fe = FaceSimilarityEvaluator(af)
        embs = [e[0] for e in fe.embed_folder(list_images(args.ref_images)) if len(e)]
        if embs:
            m = np.mean(np.stack(embs), axis=0, keepdims=True)
            faceid = m / np.linalg.norm(m, axis=-1, keepdims=True)
    if faceid is None:
        faceid = rng.standard_normal((1, 512)).astype(np.float32)
        faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)

    # teacher conditioning: forward embeddings, max_len 21 ("remove all
    # paddings", ddpm.py:5427); negative = zero-face embeddings
    ctx, _ = a2f.forward_face_embs(a2f_text, pipe.tokenizer, jnp.asarray(faceid),
                                   text_cfg=pipe.text_cfg, input_max_length=21)
    neg_ctx, _ = a2f.forward_face_embs(a2f_text, pipe.tokenizer,
                                       jnp.zeros((1, 512)),
                                       text_cfg=pipe.text_cfg, input_max_length=21)
    cond = jnp.tile(ctx, (args.n_samples, 1, 1))
    uncond = jnp.tile(neg_ctx, (args.n_samples, 1, 1))
    imgs = pipe.generate(None, context=cond[None], context_uncond=uncond[None],
                         num_steps=args.ddim_steps,
                         guidance_scale=args.guidance_scale, seed=args.seed)
    paths = common.save_images(imgs, args.outdir, prefix="arc2face")
    print(f"saved {len(paths)} teacher generations to {args.outdir}")
    return paths


if __name__ == "__main__":
    main()
