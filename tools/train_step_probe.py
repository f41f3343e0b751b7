"""Full-size Stage-1 recon train-step timing on the real TPU.

Builds the production zero-shot recon step (trainable SubjBasisGenerator
incl. its CLIP inversion tower, frozen full-size SD-1.5 UNet + CLIP text
towers, splicing, Prodigy) at bs=4 / 64x64 latents and times steady-state
steps with scalar-fetch sync (PERF.md timing rules).

--minkab additionally re-jits the step with attention._FLASH_MIN_K forced
to 0 (the pre-round-3 behavior: the Pallas flash kernel also served the
Sk=77 cross-attention) for a same-run A/B of the dispatch heuristic.

Usage: python tools/train_step_probe.py [--bs 4] [--steps 5] [--minkab]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--minkab", action="store_true",
                    help="A/B _FLASH_MIN_K=0 (flash cross-attn) vs current")
    ap.add_argument("--remat", action="store_true",
                    help="same-run A/B of jax.checkpoint save policies "
                         "(unet._REMAT_POLICY: '' / dots / dots_nobatch)")
    args = ap.parse_args()

    from adaprompt_tpu.adaface import subj_basis_generator as sbg
    from adaprompt_tpu.models import clip_text, unet as unet_mod
    from adaprompt_tpu.ops import attention as attn
    from adaprompt_tpu.train import steps as steps_mod
    from adaprompt_tpu.train import trainer as trainer_mod
    from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

    log(f"devices: {jax.devices()}")
    tok = CLIPTokenizer.load()
    tcfg = clip_text.CLIPTextConfig()
    ucfg = unet_mod.SD15_UNET_CONFIG
    t0 = time.perf_counter()
    # host-side init + bulk transfer (docs/PERF.md round-4 cold-start fix:
    # eager accelerator RNG costs one ~3.5 ms tunnel dispatch per tensor —
    # minutes for the full stack; measured 362 s in the round-5 session)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        frozen_h = steps_mod.FrozenSD(
            unet=unet_mod.init_params(keys[0], ucfg),
            text=clip_text.init_params(keys[1], tcfg),
            arc2face_text=clip_text.init_params(keys[2], tcfg),
            teacher_unet=None,
            unet_cfg=ucfg, text_cfg=tcfg, arc2face_text_cfg=tcfg)
        scfg = sbg.SubjBasisConfig(placeholder_is_bg=False, text_cfg=tcfg)
        sbg_params_h = sbg.init_params(keys[3], scfg)
    dev = jax.local_devices()[0]
    frozen = steps_mod.FrozenSD(
        unet=jax.device_put(frozen_h.unet, dev),
        text=jax.device_put(frozen_h.text, dev),
        arc2face_text=jax.device_put(frozen_h.arc2face_text, dev),
        teacher_unet=None, unet_cfg=ucfg, text_cfg=tcfg,
        arc2face_text_cfg=tcfg)
    sbg_params = jax.device_put(sbg_params_h, dev)
    log(f"param init: {time.perf_counter()-t0:.0f}s")

    tx_cfg = trainer_mod.TrainerConfig(max_steps=1000, grad_accum=1)
    optimizer = trainer_mod.build_optimizer(tx_cfg)
    state = steps_mod.create_train_state({"subj_basis": sbg_params}, optimizer)
    fp = steps_mod.frozen_params(frozen)

    b = args.bs
    rng = np.random.default_rng(0)
    ids = tok(["a photo of a z person"] * b, max_length=77)
    faceid = rng.standard_normal((b, 512)).astype(np.float32)
    faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)
    batch = {
        "z0": jnp.asarray(rng.standard_normal((b, 64, 64, 4)), jnp.float32),
        "faceid": jnp.asarray(faceid),
        "caption_ids": jnp.asarray(ids),
        "subj_bi": jnp.arange(b, dtype=jnp.int32),
        "subj_pos": jnp.full((b,), 5, jnp.int32),
        "fg_mask": jnp.asarray(rng.random((b, 64, 64, 1)) > 0.5, jnp.float32),
        "aug_mask": None,
        "skip_weights": jnp.asarray([0.5, 0.5], jnp.float32),
    }

    if args.remat and args.minkab:
        ap.error("--remat and --minkab are separate A/Bs; run one at a time")
    variants = [("current", None, None)]
    if args.minkab:
        variants.append(("flash-cross (MIN_K=0)", 0, None))
    if args.remat:
        # _REMAT_POLICY is read at TRACE time by unet._block_remat, so
        # patching the module global between jits gives a same-run A/B.
        # (extends rather than replaces: "current" doubles as the
        # save-nothing baseline only when the env default is unset)
        variants = [("remat=save-nothing", None, "none"),
                    ("remat=dots_saveable (default)", None, "dots"),
                    ("remat=dots_nobatch", None, "dots_nobatch")]
    for tag, mink, remat in variants:
        saved = attn._FLASH_MIN_K
        saved_remat = unet_mod._REMAT_POLICY
        if mink is not None:
            attn._FLASH_MIN_K = mink
        if remat is not None:
            unet_mod._REMAT_POLICY = remat
        try:
            step = jax.jit(trainer_mod.make_zs_recon_step(
                optimizer, frozen, tok, scfg, fgbg_reg=True))
            t0 = time.perf_counter()
            st, metrics = step(state, fp, batch, jax.random.PRNGKey(1))
            loss = float(metrics["loss_recon"])
            log(f"[{tag}] compile+1st step: {time.perf_counter()-t0:.0f}s "
                f"loss={loss:.4f}")
            key = jax.random.PRNGKey(2)
            t0 = time.perf_counter()
            for i in range(args.steps):
                key, k = jax.random.split(key)
                st, metrics = step(st, fp, batch, k)
            float(metrics["loss_recon"])       # scalar-fetch sync
            dt = (time.perf_counter() - t0) / args.steps
            log(f"[{tag}] steady state: {dt:.3f} s/step (bs={b})")
        except Exception as e:
            # a policy variant may exceed the 16GB chip (it saves more) —
            # record and continue the sweep
            log(f"[{tag}] FAILED: {e!r}")
        finally:
            attn._FLASH_MIN_K = saved
            unet_mod._REMAT_POLICY = saved_remat


if __name__ == "__main__":
    main()
