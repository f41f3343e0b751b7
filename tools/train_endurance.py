"""Full-size Stage-1 endurance run on the real chip (round-4 verdict 1b).

Drives the PRODUCTION AdaPromptTrainer (zero-shot recon + arc2face-distill
iteration mix, fg/bg regularizers, Prodigy, manual grad accumulation,
deferred metrics) at reference Stage-1 shapes (bs=4, 512px) for a
wall-clock budget, and reports:

  * steps completed, s/step by decile (drift over the run),
  * host RSS growth (leak canary; device memory_stats() is not implemented
    on the axon platform),
  * loss trajectory (first/last-window means per loss key),
  * a mid-run save_full_state/load_full_state round trip verified
    BIT-FOR-BIT: the run's host RNG/key are checkpointed (round-5
    save_full_state), the next N batches are teed, and a SECOND trainer
    resumed from the snapshot replays them — continued losses must match
    the uninterrupted run exactly.

No assets are required: synthetic 512px subjects are written to --workdir,
faces are synthetic (synthetic_faces=True) and the teacher is the
self-teacher fallback — the COMPUTE is identical to a real Stage-1 run
(reference: the 2xA6000 multi-day runs, /root/reference/README.md:63-83,
ddpm.py:515-638).

Usage: python tools/train_endurance.py --minutes 60 [--bs 4] [--size 512]
       [--resume-check] [--report out.json]
"""

import argparse
import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (same location as bench.py / cli/common.py):
# each ND-distill variant costs ~400 s to compile through the tunnel, so a
# short run without the cache spends its whole budget compiling
_CACHE_DIR = os.path.expanduser("~/.cache/adaprompt_jax")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(m):
    print(m, flush=True)


def make_subjects(root, n_subj=3, n_img=4, size=512, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    for s in range(n_subj):
        d = os.path.join(root, f"subj{s}")
        os.makedirs(d, exist_ok=True)
        for i in range(n_img):
            Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                         dtype=np.uint8)).save(
                os.path.join(d, f"i{i}.jpg"))
            m = np.zeros((size, size), np.uint8)
            # size-relative fg square (a fixed-pixel square lands entirely
            # out of bounds at small --size, zeroing the mask and making
            # every fg-weighted loss vacuously 0)
            y0, x0 = rng.integers(size // 16, size // 4, 2)
            side = size // 2 + size // 8
            m[y0:y0 + side, x0:x0 + side] = 255
            Image.fromarray(m).save(os.path.join(d, f"i{i}_mask.png"))


class TeeIterator:
    """Wraps the batch iterator; keeps the last `keep` raw batches so a
    resumed trainer can replay exactly what the main run consumed."""

    def __init__(self, it, keep=64):
        self.it = it
        self.log = []
        self.keep = keep
        self.recording = False

    def __iter__(self):
        return self

    def __next__(self):
        b = next(self.it)
        if self.recording:
            self.log.append(b)
            self.log = self.log[-self.keep:]
        return b


def rss_mb():
    """CURRENT resident set (VmRSS), not ru_maxrss — the high-water mark
    is monotone by definition and cannot distinguish a leak from one
    transient peak (e.g. a snapshot save or a new ND-variant compile)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_trainer(args, frozen, vae_params, vcfg, tok, scfg, sbg_params, it,
                  outdir):
    from adaprompt_tpu.train import trainer as trainer_mod
    cfg = trainer_mod.TrainerConfig(
        max_steps=args.max_steps, grad_accum=2,
        arc2face_distill_iter_prob=1.0,          # published Stage-1 mix
        max_num_denoising_steps=args.nd, fgbg_reg=True,
        allow_self_teacher=True, ckpt_every=10 ** 9,
        metrics_flush_every=16, out_dir=outdir,
        compute_dtype="bfloat16", seed=0)
    return trainer_mod.AdaPromptTrainer(
        frozen, vae_params, vcfg, tok, scfg, sbg_params, it, cfg,
        synthetic_faces=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--nd", type=int, default=5)
    ap.add_argument("--max_steps", type=int, default=120_000)
    ap.add_argument("--resume-check", action="store_true", default=True)
    ap.add_argument("--no-resume-check", dest="resume_check",
                    action="store_false")
    ap.add_argument("--resume-at-min", type=float, default=None,
                    help="minutes into the run to snapshot (default: half)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--report", default="/tmp/endurance_report.json")
    args = ap.parse_args()

    from adaprompt_tpu.adaface import subj_basis_generator as sbg
    from adaprompt_tpu.data import dataset as ds
    from adaprompt_tpu.models import clip_text, unet as unet_mod, vae as vae_mod
    from adaprompt_tpu.train import steps as steps_mod
    from adaprompt_tpu.utils.tokenizer import CLIPTokenizer

    log(f"devices: {jax.devices()}")
    workdir = args.workdir or tempfile.mkdtemp(prefix="endurance_")
    data_root = os.path.join(workdir, "subjects")
    make_subjects(data_root, size=args.size)

    tok = CLIPTokenizer.load()
    tcfg = clip_text.CLIPTextConfig()
    ucfg = unet_mod.SD15_UNET_CONFIG
    vcfg = vae_mod.SD15_VAE_CONFIG

    # host-side init + bulk transfer (docs/PERF.md round-4 cold-start fix)
    t0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        keys = jax.random.split(jax.random.PRNGKey(0), 5)

        def unzero(tree, key):
            # re-randomize the reference's zero_module-initialized
            # projections: a fresh UNet is a ZERO function, which makes
            # recon grads exactly 0 and distill losses identically 0 —
            # stability would be measured but resume equality and loss
            # trends would be vacuous (tests/test_convergence.py has the
            # full analysis)
            leaves, treedef = jax.tree.flatten(tree)
            out = []
            for leaf in leaves:
                if leaf.ndim >= 2 and not jnp.any(leaf):
                    key, k = jax.random.split(key)
                    leaf = 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
                out.append(leaf)
            return jax.tree.unflatten(treedef, out)

        frozen_host = steps_mod.FrozenSD(
            unet=unzero(unet_mod.init_params(keys[0], ucfg),
                        jax.random.PRNGKey(99)),
            text=clip_text.init_params(keys[1], tcfg),
            arc2face_text=clip_text.init_params(keys[2], tcfg),
            teacher_unet=None,
            unet_cfg=ucfg, text_cfg=tcfg, arc2face_text_cfg=tcfg)
        vae_host = vae_mod.init_params(keys[3], vcfg)
        scfg = sbg.SubjBasisConfig(placeholder_is_bg=False, text_cfg=tcfg)
        sbg_params = sbg.init_params(keys[4], scfg)
    dev = jax.local_devices()[0]
    frozen = steps_mod.FrozenSD(
        unet=jax.device_put(frozen_host.unet, dev),
        text=jax.device_put(frozen_host.text, dev),
        arc2face_text=jax.device_put(frozen_host.arc2face_text, dev),
        teacher_unet=None, unet_cfg=ucfg, text_cfg=tcfg,
        arc2face_text_cfg=tcfg)
    vae_params = jax.device_put(vae_host, dev)
    log(f"param init+transfer: {time.perf_counter() - t0:.0f}s")

    subjects = ds.scan_subject_folders(data_root)
    dset = ds.PersonalizedDataset(subjects, size=args.size, seed=0,
                                  num_vectors_per_subj_token=scfg.num_out_embs_per_layer)
    tee = TeeIterator(ds.make_batch_iterator(
        dset, ds.SubjectSampler(subjects, seed=0), batch_size=args.bs,
        num_workers=2))
    tr = build_trainer(args, frozen, vae_params, vcfg, tok, scfg, sbg_params,
                       tee, os.path.join(workdir, "runA"))

    budget_s = args.minutes * 60.0
    resume_at_s = ((args.resume_at_min * 60.0) if args.resume_at_min
                   else budget_s / 2)
    rss0 = rss_mb()
    step_times, losses, iter_types = [], {}, {}
    snapshot = None
    t_start = time.perf_counter()
    i = 0
    log(f"running for {args.minutes:.0f} min (resume snapshot at "
        f"{resume_at_s/60:.0f} min)...")
    while time.perf_counter() - t_start < budget_s:
        ts = time.perf_counter()
        m = tr.train_step(i)
        step_times.append(time.perf_counter() - ts)
        it_ty = m.get("iter_type", "?")
        iter_types[it_ty] = iter_types.get(it_ty, 0) + 1
        for k, v in m.items():
            if k.startswith("loss") and v is not None:
                try:
                    losses.setdefault(k, []).append(float(v))
                except (TypeError, ValueError):
                    pass
        if (args.resume_check and snapshot is None
                and time.perf_counter() - t_start >= resume_at_s):
            tr._flush_metrics()
            path = tr.save_full_state(i + 1)
            tee.recording = True
            snapshot = {"path": path, "step": i + 1, "cont": []}
            log(f"[{i}] snapshot saved: {path} (rss {rss_mb():.0f} MB)")
        elif snapshot is not None and len(snapshot["cont"]) < 4:
            snapshot["cont"].append(
                {k: float(v) for k, v in m.items()
                 if isinstance(v, (int, float, np.floating))
                 or (hasattr(v, "shape") and getattr(v, "shape", None) == ())})
        if i % 200 == 0:
            lkeys = [k for k in losses if losses[k]]
            lmsg = " ".join(f"{k}~{np.mean(losses[k][-50:]):.4g}"
                            for k in sorted(lkeys)[:3])
            log(f"[{i}] {step_times[-1]:.2f}s/step rss={rss_mb():.0f}MB "
                f"{lmsg}")
        i += 1
    n_steps = i
    wall = time.perf_counter() - t_start
    tr._flush_metrics()

    # ---- resume equality check -------------------------------------------
    resume_ok = None
    if snapshot is not None and len(snapshot["cont"]) >= 2:
        log("resume check: rebuilding trainer from snapshot...")
        # free run A's device state first — two full trainer states plus
        # both sets of executables exhaust the 16GB chip (the first round-5
        # endurance run died RESOURCE_EXHAUSTED here)
        import gc
        tr.state = None
        tr._pending_metrics = []
        tr._distill_steps = {}
        gc.collect()
        replay = iter(list(tee.log))
        tr2 = build_trainer(args, frozen, vae_params, vcfg, tok, scfg,
                            sbg_params, replay,
                            os.path.join(workdir, "runB"))
        tr2.load_full_state(snapshot["path"])
        resume_ok = True
        base_step = snapshot["step"]
        for j, want in enumerate(snapshot["cont"]):
            m2 = tr2.train_step(base_step + j)
            for k, v in want.items():
                if not k.startswith("loss"):
                    continue
                got = float(m2.get(k, np.nan))
                if got != v:
                    resume_ok = False
                    log(f"  MISMATCH step {base_step + j} {k}: "
                        f"{v!r} vs {got!r}")
        log(f"resume bit-for-bit: {'OK' if resume_ok else 'FAILED'}")

    st = np.asarray(step_times)
    deciles = [round(float(np.median(c)), 3)
               for c in np.array_split(st, 10)] if n_steps >= 10 else []
    report = {
        "minutes": round(wall / 60, 1), "steps": n_steps,
        "s_per_step_median": round(float(np.median(st)), 3),
        "s_per_step_decile_medians": deciles,
        "iter_types": iter_types,
        "rss_mb_start": round(rss0), "rss_mb_end": round(rss_mb()),
        "loss_first_last": {
            k: [float(f"{np.mean(v[:max(len(v) // 10, 5)]):.6g}"),
                float(f"{np.mean(v[-max(len(v) // 10, 5):]):.6g}")]
            for k, v in losses.items() if len(v) >= 10},
        "resume_bit_for_bit": resume_ok,
        "workdir": workdir,
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=1)
    log(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
