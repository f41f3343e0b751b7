"""Training CLI — role of /root/reference/main.py.

Stage-1 example (Arc2Face distillation, README.md:63):
  python -m adaprompt_tpu.cli.train --stage 1 \
      --data_roots /data/vggface2 /data/ffhq \
      --ckpt sd15.safetensors --arc2face_ckpt arc2face.safetensors \
      --arcface_ckpt arcface_r100.pt --max_steps 120000 --bs 4

Stage-2 example (compositional distillation, README.md:80):
  python -m adaprompt_tpu.cli.train --stage 2 \
      --data_roots ... --adaface_ckpt runs/s1/embeddings_gs-120000.npz \
      --clip_ckpt clip-vit-b32.safetensors --max_steps 60000 --bs 3

Signal handling (main.py:1183-1209): SIGUSR1 checkpoints and continues;
KeyboardInterrupt / a crash checkpoints full trainer state before exiting
(the reference's melk()).
"""

from __future__ import annotations

import argparse
import os
import signal

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
    from adaprompt_tpu.utils.config import add_config_args, apply_config_files
    p = argparse.ArgumentParser()
    add_config_args(p)   # --base yaml(s) + --set dotlist (main.py:820-824)
    common.add_model_args(p)
    p.add_argument("--data_roots", type=str, nargs="+", required=True)
    p.add_argument("--stage", type=int, default=1, choices=(1, 2),
                   help="hyperparameter preset: 1 = Arc2Face distillation "
                        "(README.md:63), 2 = compositional (README.md:80)")
    p.add_argument("--arc2face_ckpt", type=str, default=None,
                   help="arc2face UNet+text-encoder checkpoint")
    p.add_argument("--arcface_ckpt", type=str, default=None,
                   help="ArcFace IResNet-100 weights for REAL face identity "
                        "embeddings (required unless --synthetic_faces)")
    p.add_argument("--synthetic_faces", action="store_true",
                   help="train on random face ids (smoke runs only; the "
                        "reference's gen_arc2face_rand_face fallback)")
    p.add_argument("--detector", type=str, default=None,
                   help="face detector: 'retinaface:<Resnet50_Final.pth|"
                        ".onnx>' (the reference's RetinaFace semantics, "
                        "models/retinaface.py; default when "
                        "$ADAPROMPT_RETINAFACE_CKPT is set), "
                        "'bisenet:<79999_iter.pth>' (parsing "
                        "detection + alignment; default when "
                        "$ADAPROMPT_BISENET_CKPT is set), "
                        "'cascade:<opencv_xml_path>', or 'center_crop' "
                        "(the default otherwise)")
    p.add_argument("--clip_ckpt", type=str, default=None,
                   help="CLIP ViT-B/32 weights for compositional teacher "
                        "filtering (do_clip_teacher_filtering)")
    p.add_argument("--no_teacher_filter", action="store_true",
                   help="explicit opt-in: run compositional iterations "
                        "WITHOUT the CLIP teacher filter (every fresh "
                        "compos iter treated as teachable; the reference "
                        "keeps only ~30-40%%). Smoke runs only.")
    p.add_argument("--adaface_ckpt", type=str, default=None,
                   help="resume the SubjBasisGenerator from this ckpt")
    p.add_argument("--resume_state", type=str, default=None,
                   help="full trainer_state-*.npz (params+optimizer+step)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--bs", type=int, default=None)
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--optimizer", type=str, default="Prodigy")
    p.add_argument("--d_coef", type=float, default=None)
    p.add_argument("--warm_up_steps", type=int, default=None)
    p.add_argument("--composition_regs_iter_gap", type=int, default=None)
    p.add_argument("--arc2face_distill_iter_prob", type=float, default=None)
    p.add_argument("--max_num_denoising_steps", type=int, default=None)
    p.add_argument("--num_candidate_teachers", type=int, default=2)
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
    p.add_argument("--num_workers", type=int, default=2,
                   help="data-loader worker threads (0 = synchronous)")
    p.add_argument("--mode", type=str, default="zeroshot",
                   choices=("zeroshot", "static"),
                   help="zeroshot = train the SubjBasisGenerator (AdaFace); "
                        "static = legacy per-subject textual-inversion "
                        "embeddings (StaticLayerwiseEmbedding)")
    p.add_argument("--static_rank", type=int, default=6,
                   help="static mode: LoRA-style basis rank r")
    p.add_argument("--num_vectors_per_subj_token", type=int, default=16)
    p.add_argument("--use_conv_attn_kernel_size", type=int, default=None,
                   help="subject-token conv attention kernel size "
                        "(reference main.py:225); requires "
                        "num_vectors_per_subj_token >= ks*ks")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of a few steps here")
    args = p.parse_args(argv)
    return apply_config_files(args, p, argv)


def build_trainer_config(args) -> trainer_mod.TrainerConfig:
    base = (trainer_mod.TrainerConfig() if args.stage == 1
            else trainer_mod.TrainerConfig.stage2())
    overrides = dict(
        grad_accum=args.accum, optimizer_type=args.optimizer,
        num_candidate_teachers=args.num_candidate_teachers,
        seed=args.seed, ckpt_every=args.ckpt_every, out_dir=args.out_dir,
        compute_dtype="bfloat16" if args.bf16 else "float32")
    for name in ("max_steps", "d_coef", "warm_up_steps",
                 "composition_regs_iter_gap", "arc2face_distill_iter_prob",
                 "max_num_denoising_steps", "use_conv_attn_kernel_size"):
        v = getattr(args, name)
        if v is not None:
            overrides[name] = v
    return trainer_mod.TrainerConfig(**{**base.__dict__, **overrides})


def train_static(args, pipe, frozen):
    """Legacy textual-inversion mode: per-subject StaticLayerwiseEmbedding
    trained by masked reconstruction (embedding_manager.py:362-539)."""
    import numpy as np
    from adaprompt_tpu.adaface import conditioner as cond_mod
    from adaprompt_tpu.adaface import static_embedder as se
    from adaprompt_tpu.adaface import checkpoint as ckpt_mod
    from adaprompt_tpu.models import vae as vae_mod

    tok = pipe.tokenizer
    cfg = build_trainer_config(args)
    scfg = se.StaticEmbedderConfig(num_vectors=args.num_vectors_per_subj_token,
                                   rank=args.static_rank,
                                   out_emb_dim=pipe.text_cfg.hidden_size)
    params = {"static_emb": se.init_params(jax.random.PRNGKey(args.seed), scfg)}
    optimizer = trainer_mod.build_optimizer(cfg)
    state = steps_mod.create_train_state(params, optimizer)
    step_fn = jax.jit(trainer_mod.make_static_recon_step(
        optimizer, frozen, scfg,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32))

    subjects = ds.scan_subject_folders(args.data_roots)
    dset = ds.PersonalizedDataset(subjects, size=args.size, seed=args.seed,
                                  num_vectors_per_subj_token=scfg.num_vectors)
    it = ds.make_batch_iterator(dset, ds.SubjectSampler(subjects, seed=args.seed),
                                batch_size=args.bs or 4,
                                num_workers=args.num_workers)
    spec = cond_mod.make_placeholders(tok, ("z",), (),
                                      num_vectors_subj=scfg.num_vectors)[0]
    encode = jax.jit(lambda imgs: vae_mod.encode(
        pipe.params.vae, imgs, cfg=pipe.vae_cfg)[0] * 0.18215)

    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    n = args.num_steps or cfg.max_steps
    for i in range(n):
        raw = next(it)
        imgs = jnp.asarray(raw["image"], jnp.bfloat16 if args.bf16 else jnp.float32)
        ids = tok([c for c in raw["caption"]])
        bi, pos = cond_mod.find_placeholder_indices(ids, spec)
        b = imgs.shape[0]
        batch = {"z0": encode(imgs).astype(jnp.float32),
                 "caption_ids": jnp.asarray(ids),
                 "subj_bi": jnp.asarray(bi if len(bi) == b else np.arange(b), jnp.int32),
                 "subj_pos": jnp.asarray(pos if len(pos) == b else np.full(b, 1), jnp.int32),
                 "fg_mask": None, "aug_mask": None,
                 "skip_weights": jnp.asarray([0.5, 0.5], jnp.float32)}
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, steps_mod.frozen_params(frozen), batch, k)
        if (i + 1) % cfg.ckpt_every == 0 or i == n - 1:
            ckpt_mod.save_checkpoint(
                os.path.join(args.out_dir, f"static_emb_gs-{i + 1}.npz"),
                {"static_emb": state.params["static_emb"]},
                meta={"step": i + 1, "mode": "static"})
        print(f"step {i}: loss {float(metrics['loss_recon']):.4f}")


def main(argv=None):
    args = parse_args(argv)
    pipe = common.load_pipeline(args)
    tok = pipe.tokenizer

    allow_self_teacher = False
    if args.arc2face_ckpt and os.path.exists(args.arc2face_ckpt):
        a2f_sd = torch_port.load_state_dict(args.arc2face_ckpt)
        parts = torch_port.split_sd_checkpoint(a2f_sd)
        teacher_unet = unet_mod.from_torch(parts["unet"] or a2f_sd)
        a2f_text = clip_text.from_torch(parts["text"] or a2f_sd)
    else:
        # no Arc2Face teacher: distilling against the student's own frozen
        # SD UNet is meaningless for a real run — allowed only under the
        # same explicit smoke-run opt-in as random face ids
        if not args.synthetic_faces and args.mode != "static":
            raise SystemExit(
                "no --arc2face_ckpt: a real training run would distill "
                "against the student's own frozen UNet. Pass "
                "--arc2face_ckpt, or --synthetic_faces for a smoke run "
                "that accepts the self-teacher fallback.")
        print("WARNING: no arc2face ckpt — teacher uses the SD UNet/text "
              "weights (smoke-run fallback).")
        teacher_unet = pipe.params.unet
        a2f_text = pipe.params.text
        allow_self_teacher = True

    frozen = steps_mod.FrozenSD(
        unet=pipe.params.unet, text=pipe.params.text,
        arc2face_text=a2f_text, teacher_unet=teacher_unet,
        unet_cfg=pipe.unet_cfg, text_cfg=pipe.text_cfg,
        arc2face_text_cfg=pipe.text_cfg)

    if args.mode == "static":
        return train_static(args, pipe, frozen)

    scfg = sbg.SubjBasisConfig(placeholder_is_bg=False, text_cfg=pipe.text_cfg)
    sbg_params = sbg.init_params(jax.random.PRNGKey(args.seed), scfg)

    # real identity embeddings: ArcFace trunk on host-detected crops
    # (get_arc2face_id_prompt_embs, adaface/util.py:242-341)
    face_embedder = None
    if args.arcface_ckpt:
        from adaprompt_tpu.eval.face_eval import (FaceSimilarityEvaluator,
                                                  make_detector)
        from adaprompt_tpu.models import arcface
        if args.arcface_ckpt.endswith(".onnx"):
            # insightface antelopev2 glintr100.onnx, weights extracted
            # without an ONNX runtime (utils/onnx_port.py)
            af_params = arcface.from_onnx(args.arcface_ckpt)
        else:
            af_params = arcface.from_torch(
                torch_port.load_state_dict(args.arcface_ckpt))
        face_embedder = FaceSimilarityEvaluator(
            af_params, detector=make_detector(args.detector))
    elif not args.synthetic_faces:
        raise SystemExit(
            "--arcface_ckpt is required: without it every iteration distills "
            "against a random identity. Pass --synthetic_faces to opt into "
            "that for smoke tests.")

    cfg = build_trainer_config(args)
    if allow_self_teacher:
        cfg = trainer_mod.TrainerConfig(**{**cfg.__dict__,
                                           "allow_self_teacher": True})

    # CLIP teacher filtering (do_clip_teacher_filtering, yaml:31)
    clip_scorer = None
    if cfg.composition_regs_iter_gap > 0:
        if args.clip_ckpt:
            from adaprompt_tpu.eval.clip_scorer import CLIPScorer
            clip_scorer = CLIPScorer.from_torch(
                torch_port.load_state_dict(args.clip_ckpt), tokenizer=tok)
        elif not args.no_teacher_filter:
            # refuse rather than silently train on a worse distribution:
            # the reference's filter keeps only ~30-40% of fresh compos
            # iters (ddpm.py:3649-3664)
            raise SystemExit(
                "compositional training without --clip_ckpt disables the "
                "CLIP teacher filter: EVERY fresh compositional iteration "
                "would be treated as teachable (the reference keeps only "
                "~30-40%, ddpm.py:3649-3664). Pass --clip_ckpt, or opt in "
                "explicitly with --no_teacher_filter.")
        else:
            print("=" * 70)
            print("WARNING: --no_teacher_filter — CLIP teacher filtering "
                  "DISABLED;\nevery compositional iteration is treated as "
                  "teachable. The training\ndistribution differs materially "
                  "from the reference Stage-2 run.\n(metrics.jsonl carries "
                  "teacher_filter_disabled=1 on compos iters.)")
            print("=" * 70)
            cfg = trainer_mod.TrainerConfig(**{**cfg.__dict__,
                                               "no_teacher_filter": True})

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
    bs = args.bs or (4 if args.stage == 1 else 3)   # README.md:63, 80
    it = ds.make_batch_iterator(dset, ds.SubjectSampler(subjects, seed=args.seed),
                                batch_size=bs, num_workers=args.num_workers)

    tr = trainer_mod.AdaPromptTrainer(frozen, pipe.params.vae, pipe.vae_cfg,
                                      tok, scfg, sbg_params, it, cfg,
                                      face_embedder=face_embedder,
                                      clip_scorer=clip_scorer,
                                      synthetic_faces=args.synthetic_faces)
    start = 0
    if args.resume_state:
        meta = tr.load_full_state(args.resume_state)
        start = int(meta["step"])
        print(f"resumed full trainer state at step {start}")
    elif args.adaface_ckpt:
        tr.load_checkpoint(args.adaface_ckpt)

    mesh = None
    if len(jax.devices()) > 1 or args.fsdp > 1:
        mesh = tr.distribute(fsdp=args.fsdp)
        print(f"training over mesh {dict(mesh.shape)}")

    # SIGUSR1: checkpoint-and-continue (main.py:1183-1199)
    state = {"step": start}

    def _on_usr1(signum, frame):
        path = tr.save_full_state(state["step"])
        print(f"SIGUSR1: saved {path}")

    try:
        signal.signal(signal.SIGUSR1, _on_usr1)
    except (ValueError, OSError):
        pass  # non-main thread / platform without SIGUSR1

    import contextlib
    ctx = mesh or contextlib.nullcontext()
    with ctx:
        n = args.num_steps or cfg.max_steps
        import time as _time
        t0 = _time.time()
        try:
            for i in range(start, n):
                state["step"] = i
                if args.profile_dir and i == start + 2:
                    jax.profiler.start_trace(args.profile_dir)
                m = tr.train_step(i)
                if args.profile_dir and i == start + 4:
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {args.profile_dir}")
                if args.sample_every and (i + 1) % args.sample_every == 0:
                    tr.log_samples(i + 1)
                if (i + 1) % cfg.ckpt_every == 0 or i == n - 1:
                    tr.save_checkpoint(i + 1)
        except BaseException:
            # melk(): checkpoint on interrupt/crash (main.py:1204-1209)
            path = tr.save_full_state(state["step"])
            print(f"interrupted: saved full trainer state to {path}")
            raise
        print(f"trained {n - start} steps in {_time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
