"""Stage-2 compositional iteration step-time probe (real chip).

Measures the two halves of a compositional iteration at reference shapes
(512px images -> 64x64 latents, 4-type prompt batch, BLOCK_SIZE=1):

  * TRAIN phase (make_compos_train_phase): run with clip_scorer=None so
    every compositional iter is teachable and trains.
  * FILTER phase (make_filter_phase + jitted ctx4): run with a random-init
    CLIP scorer — random similarities never pass the 0.28/0.002 operating
    point, so every compositional iter stops after filtering.

Reference cost anatomy: the 4-type batch (4 x 64x64) UNet calls per compos
iter were the torch reference's biggest step-time sink (ddpm.py:2602-2606,
round-2 verdict). Results are recorded in docs/PERF.md.

Usage: python tools/compos_probe.py [--steps 6] [--size 512]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_subject_tree(root, size, n_imgs=4):
    from PIL import Image
    rng = np.random.default_rng(0)
    d = os.path.join(root, "probe_subject")
    os.makedirs(d, exist_ok=True)
    for i in range(n_imgs):
        Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                     dtype=np.uint8)).save(
            os.path.join(d, f"i{i}.jpg"))
        m = np.zeros((size, size), np.uint8)
        m[size // 4: 3 * size // 4, size // 4: 3 * size // 4] = 255
        Image.fromarray(m).save(os.path.join(d, f"i{i}_mask.png"))
    return root


def run_steps(tr, n, label):
    rows = []
    for i in range(n):
        t0 = time.perf_counter()
        m = tr.train_step(i)
        dt = time.perf_counter() - t0
        rows.append((m["iter_type"], dt))
        log(f"  [{label}] step {i}: {m['iter_type']:24s} {dt:7.2f}s")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--bs", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from adaprompt_tpu.adaface import subj_basis_generator as sbg
    from adaprompt_tpu.data import dataset as ds
    from adaprompt_tpu.pipeline import StableDiffusionPipeline
    from adaprompt_tpu.train import steps as steps_mod
    from adaprompt_tpu.train import trainer as trainer_mod

    log(f"devices: {jax.devices()}")
    pipe = StableDiffusionPipeline.random_init(0, param_dtype=jnp.bfloat16)
    frozen = steps_mod.FrozenSD(
        unet=pipe.params.unet, text=pipe.params.text,
        arc2face_text=pipe.params.text, teacher_unet=pipe.params.unet,
        unet_cfg=pipe.unet_cfg, text_cfg=pipe.text_cfg,
        arc2face_text_cfg=pipe.text_cfg)
    scfg = sbg.SubjBasisConfig(placeholder_is_bg=False, text_cfg=pipe.text_cfg)
    sbg_params = sbg.init_params(jax.random.PRNGKey(0), scfg)

    with tempfile.TemporaryDirectory() as tmp:
        make_subject_tree(tmp, args.size)
        subjects = ds.scan_subject_folders(tmp)
        dset = ds.PersonalizedDataset(
            subjects, size=args.size, seed=0,
            num_vectors_per_subj_token=scfg.num_out_embs_per_layer)

        def make_trainer(scorer, outdir):
            it = ds.make_batch_iterator(dset, ds.SubjectSampler(subjects, seed=0),
                                        batch_size=args.bs)
            cfg = trainer_mod.TrainerConfig.stage2(
                max_steps=args.steps, composition_regs_iter_gap=2,
                no_teacher_filter=(scorer is None),
                arc2face_distill_iter_prob=0.0, ckpt_every=10 ** 9,
                out_dir=outdir, seed=0)
            tr = trainer_mod.AdaPromptTrainer(
                frozen, pipe.params.vae, pipe.vae_cfg, pipe.tokenizer, scfg,
                sbg_params, it, cfg, clip_scorer=scorer,
                synthetic_faces=True)
            return tr

        log("=== phase A: compos TRAIN phase (no scorer, always teachable) ===")
        rows_a = run_steps(make_trainer(None, os.path.join(tmp, "a")),
                           args.steps, "train")

        log("=== phase B: FILTER phase (random scorer, never teachable) ===")
        from adaprompt_tpu.eval.clip_scorer import CLIPScorer
        scorer = CLIPScorer.random_init(0, tokenizer=pipe.tokenizer)
        rows_b = run_steps(make_trainer(scorer, os.path.join(tmp, "b")),
                           args.steps, "filter")

    def summarize(rows, label):
        log(f"--- {label} ---")
        by = {}
        for it_type, dt in rows:
            by.setdefault(it_type, []).append(dt)
        for it_type, ts in sorted(by.items()):
            # first occurrence includes compile; steady state = the rest
            steady = ts[1:] if len(ts) > 1 else ts
            log(f"{it_type:26s} n={len(ts)} first={ts[0]:7.2f}s "
                f"steady={np.mean(steady):7.2f}s")

    summarize(rows_a, "train-phase trainer")
    summarize(rows_b, "filter-phase trainer")


if __name__ == "__main__":
    main()
