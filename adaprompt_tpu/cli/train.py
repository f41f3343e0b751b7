"""Training CLI — role of /root/reference/main.py.

Stage-1 example (Arc2Face distillation):
  python -m adaprompt_tpu.cli.train --data_roots /data/vggface2 /data/ffhq \
      --ckpt sd15.safetensors --arc2face_ckpt arc2face.safetensors \
      --max_steps 120000 --bs 4 --accum 2 --arc2face_distill_iter_prob 1.0
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface import subj_basis_generator as sbg
from adaprompt_tpu.cli import common
from adaprompt_tpu.data import dataset as ds
from adaprompt_tpu.models import clip_text, unet as unet_mod
from adaprompt_tpu.train import steps as steps_mod
from adaprompt_tpu.train import trainer as trainer_mod
from adaprompt_tpu.utils import torch_port


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    common.add_model_args(p)
    p.add_argument("--data_roots", type=str, nargs="+", required=True)
    p.add_argument("--arc2face_ckpt", type=str, default=None,
                   help="arc2face UNet+text-encoder checkpoint")
    p.add_argument("--adaface_ckpt", type=str, default=None,
                   help="resume the SubjBasisGenerator from this ckpt")
    p.add_argument("--max_steps", type=int, default=120_000)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--optimizer", type=str, default="Prodigy")
    p.add_argument("--d_coef", type=float, default=2.0)
    p.add_argument("--warm_up_steps", type=int, default=500)
    p.add_argument("--composition_regs_iter_gap", type=int, default=3)
    p.add_argument("--arc2face_distill_iter_prob", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/adaprompt")
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--overlay_source", type=str, default=None,
                   help="background-overlay dir or .tar (wds role)")
    p.add_argument("--overlay_prob", type=float, default=0.0)
    p.add_argument("--fsdp", type=int, default=1,
                   help="fsdp axis size; trains data-parallel over all chips")
    p.add_argument("--sample_every", type=int, default=0,
                   help="save a sample grid every N steps (ImageLogger role)")
    p.add_argument("--num_steps", type=int, default=None,
                   help="steps to run this invocation (default: max_steps)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    pipe = common.load_pipeline(args)
    tok = pipe.tokenizer

    if args.arc2face_ckpt and os.path.exists(args.arc2face_ckpt):
        a2f_sd = torch_port.load_state_dict(args.arc2face_ckpt)
        parts = torch_port.split_sd_checkpoint(a2f_sd)
        teacher_unet = unet_mod.from_torch(parts["unet"] or a2f_sd)
        a2f_text = clip_text.from_torch(parts["text"] or a2f_sd)
    else:
        print("WARNING: no arc2face ckpt — teacher uses the SD UNet/text weights.")
        teacher_unet = pipe.params.unet
        a2f_text = pipe.params.text

    frozen = steps_mod.FrozenSD(
        unet=pipe.params.unet, text=pipe.params.text,
        arc2face_text=a2f_text, teacher_unet=teacher_unet,
        unet_cfg=pipe.unet_cfg, text_cfg=pipe.text_cfg,
        arc2face_text_cfg=pipe.text_cfg)

    scfg = sbg.SubjBasisConfig(placeholder_is_bg=False, text_cfg=pipe.text_cfg)
    sbg_params = sbg.init_params(jax.random.PRNGKey(args.seed), scfg)

    subjects = ds.scan_subject_folders(args.data_roots)
    print(f"{len(subjects)} subjects, {sum(len(s.image_paths) for s in subjects)} images")
    overlay = None
    if args.overlay_source:
        from adaprompt_tpu.data.overlays import BackgroundOverlayProvider
        overlay = BackgroundOverlayProvider(args.overlay_source, size=args.size,
                                            seed=args.seed)
    dset = ds.PersonalizedDataset(subjects, size=args.size, seed=args.seed,
                                  num_vectors_per_subj_token=scfg.num_out_embs_per_layer,
                                  overlay_provider=overlay,
                                  overlay_prob=args.overlay_prob)
    it = ds.make_batch_iterator(dset, ds.SubjectSampler(subjects, seed=args.seed),
                                batch_size=args.bs)

    cfg = trainer_mod.TrainerConfig(
        max_steps=args.max_steps, grad_accum=args.accum,
        optimizer_type=args.optimizer, d_coef=args.d_coef,
        warm_up_steps=args.warm_up_steps,
        composition_regs_iter_gap=args.composition_regs_iter_gap,
        arc2face_distill_iter_prob=args.arc2face_distill_iter_prob,
        seed=args.seed, ckpt_every=args.ckpt_every, out_dir=args.out_dir,
        compute_dtype="bfloat16" if args.bf16 else "float32")

    tr = trainer_mod.AdaPromptTrainer(frozen, pipe.params.vae, pipe.vae_cfg,
                                      tok, scfg, sbg_params, it, cfg)
    if args.adaface_ckpt:
        tr.load_checkpoint(args.adaface_ckpt)

    import jax as _jax
    mesh = None
    if len(_jax.devices()) > 1 or args.fsdp > 1:
        mesh = tr.distribute(fsdp=args.fsdp)
        print(f"training over mesh {dict(mesh.shape)}")

    import contextlib
    ctx = mesh or contextlib.nullcontext()
    with ctx:
        n = args.num_steps or cfg.max_steps
        import time as _time
        t0 = _time.time()
        for i in range(n):
            tr.train_step(i)
            if args.sample_every and (i + 1) % args.sample_every == 0:
                tr.log_samples(i + 1)
            if (i + 1) % cfg.ckpt_every == 0 or i == n - 1:
                tr.save_checkpoint(i + 1)
        print(f"trained {n} steps in {_time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
