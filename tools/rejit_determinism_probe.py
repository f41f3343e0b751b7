"""Isolate the on-chip resume non-determinism (docs/PERF.md round-5
endurance item 4): the SAME train step from the SAME state and inputs,
executed through (a) the same jitted callable twice, and (b) a SECOND,
freshly-jitted but identical step function — on the CPU backend all three
results are bit-identical (both fp32 and bf16); on the chip the endurance
replay differed by ~1-3%.

If (a) differs run-to-run: the platform executes nondeterministically.
If only (b) differs: re-jitting produces a different executable (tunnel
remote-compile or cache behavior) — the resume path re-jits by design,
so that would fully explain the endurance readings.

Usage: python tools/rejit_determinism_probe.py [--bs 4] [--size 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = os.path.expanduser("~/.cache/adaprompt_jax")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(m):
    print(m, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    from adaprompt_tpu.adaface import subj_basis_generator as sbg
    from adaprompt_tpu.models import clip_text, unet as unet_mod
    from adaprompt_tpu.train import steps as steps_mod
    from adaprompt_tpu.train import trainer as trainer_mod
    from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

    log(f"devices: {jax.devices()}")
    tok = CLIPTokenizer.load()
    tcfg = clip_text.CLIPTextConfig()
    ucfg = unet_mod.SD15_UNET_CONFIG
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
        sbg_h = sbg.init_params(keys[3], scfg)
    dev = jax.local_devices()[0]
    frozen = steps_mod.FrozenSD(
        unet=jax.device_put(frozen_h.unet, dev),
        text=jax.device_put(frozen_h.text, dev),
        arc2face_text=jax.device_put(frozen_h.arc2face_text, dev),
        teacher_unet=None, unet_cfg=ucfg, text_cfg=tcfg,
        arc2face_text_cfg=tcfg)
    sbg_params = jax.device_put(sbg_h, dev)

    cfg = trainer_mod.TrainerConfig(max_steps=1000, grad_accum=1)
    optimizer = trainer_mod.build_optimizer(cfg)
    state = steps_mod.create_train_state({"subj_basis": sbg_params}, optimizer)
    fp = steps_mod.frozen_params(frozen)

    b, lat = args.bs, args.size // 8
    rng = np.random.default_rng(0)
    ids = tok(["a photo of a z person"] * b, max_length=77)
    faceid = rng.standard_normal((b, 512)).astype(np.float32)
    faceid /= np.linalg.norm(faceid, axis=-1, keepdims=True)
    batch = {
        "z0": jnp.asarray(rng.standard_normal((b, lat, lat, 4)), jnp.float32),
        "faceid": jnp.asarray(faceid),
        "caption_ids": jnp.asarray(ids),
        "subj_bi": jnp.arange(b, dtype=jnp.int32),
        "subj_pos": jnp.full((b,), 5, jnp.int32),
        "fg_mask": jnp.asarray(rng.random((b, lat, lat, 1)) > 0.5,
                               jnp.float32),
        "aug_mask": None,
        "skip_weights": jnp.asarray([0.5, 0.5], jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    def fresh_step():
        return jax.jit(trainer_mod.make_zs_recon_step(
            optimizer, frozen, tok, scfg, fgbg_reg=True))

    step_a = fresh_step()
    t0 = time.perf_counter()
    _, m1 = step_a(state, fp, batch, key)
    l1 = float(m1["loss_recon"])
    log(f"jit A call 1: loss={l1!r} ({time.perf_counter()-t0:.0f}s)")
    _, m2 = step_a(state, fp, batch, key)
    l2 = float(m2["loss_recon"])
    log(f"jit A call 2: loss={l2!r}  same-executable repeat "
        f"{'BITWISE-EQUAL' if l1 == l2 else 'DIFFERS'}")

    step_b = fresh_step()          # identical program, separate jit entry
    t0 = time.perf_counter()
    _, m3 = step_b(state, fp, batch, key)
    l3 = float(m3["loss_recon"])
    log(f"jit B call 1: loss={l3!r} ({time.perf_counter()-t0:.0f}s)  "
        f"re-jit {'BITWISE-EQUAL' if l1 == l3 else 'DIFFERS'}")

    g1 = float(m1["grad_norm"])
    g3 = float(m3["grad_norm"])
    log(f"grad_norm A={g1!r} B={g3!r} "
        f"{'BITWISE-EQUAL' if g1 == g3 else 'DIFFERS'}")


if __name__ == "__main__":
    main()
