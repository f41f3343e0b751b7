"""Checkpoint surgery tools.

Roles of /root/reference/scripts/{repl_vae.py, repl_textencoder.py,
avg_models.py, chk_ckpt_weights.py}:

  replace-vae        splice another VAE (e.g. the 840k-MSE VAE) into an SD ckpt
  replace-text       splice another text encoder (e.g. DreamShaper) into one
  average            SWA-average several AdaFace .npz checkpoints
  inspect            print per-tree tensor counts/norms of an .npz or .pt

Usage: python -m adaprompt_tpu.cli.ckpt_tools <subcommand> ...
"""

from __future__ import annotations

import argparse

import numpy as np


def replace_component(base_path: str, donor_path: str, out_path: str,
                      prefix: str):
    """Copy all `prefix*` keys of the donor over the base SD state dict and
    save as .npz (repl_vae/repl_textencoder semantics)."""
    from adaprompt_tpu.utils.torch_port import load_state_dict
    base = load_state_dict(base_path)
    donor = load_state_dict(donor_path)
    donor_keys = {k: v for k, v in donor.items() if k.startswith(prefix)}
    if not donor_keys:
        # donor may be a standalone component ckpt without the prefix
        donor_keys = {prefix + k: v for k, v in donor.items()}
    replaced = 0
    for k, v in donor_keys.items():
        if k in base and np.shape(base[k]) == np.shape(v):
            base[k] = v
            replaced += 1
    print(f"replaced {replaced} tensors under '{prefix}'")
    np.savez(out_path, **{k: np.asarray(v) for k, v in base.items()
                          if hasattr(v, "shape")})
    print(f"wrote {out_path}")


def average_checkpoints(paths, out_path):
    """SWA-average native .npz AdaFace checkpoints (avg_models.py role)."""
    from adaprompt_tpu.adaface import checkpoint as ckpt_mod
    import jax
    trees = []
    meta = {}
    for p in paths:
        t, meta = ckpt_mod.load_checkpoint(p)
        trees.append(t)
    avg = jax.tree.map(lambda *xs: sum(xs) / len(xs), *trees)
    ckpt_mod.save_checkpoint(out_path, avg, meta={**meta, "averaged_from": list(paths)})
    print(f"averaged {len(paths)} ckpts -> {out_path}")


def inspect_checkpoint(path):
    """Print tensor stats (chk_ckpt_weights.py role)."""
    if path.endswith(".npz"):
        data = np.load(path, allow_pickle=False)
        keys = [k for k in data.files if k != "__meta__"]
        print(f"{len(keys)} tensors")
        for k in sorted(keys)[:200]:
            v = data[k]
            print(f"  {k:70s} {str(v.shape):20s} norm={np.linalg.norm(v):.4f}")
    else:
        from adaprompt_tpu.utils.torch_port import load_state_dict
        sd = load_state_dict(path)
        print(f"{len(sd)} tensors")
        for k in sorted(sd)[:200]:
            v = sd[k]
            if hasattr(v, "shape"):
                print(f"  {k:70s} {str(tuple(v.shape)):20s} norm={np.linalg.norm(v):.4f}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("replace-vae")
    pv.add_argument("--base", required=True)
    pv.add_argument("--donor", required=True)
    pv.add_argument("--out", required=True)

    pt = sub.add_parser("replace-text")
    pt.add_argument("--base", required=True)
    pt.add_argument("--donor", required=True)
    pt.add_argument("--out", required=True)

    pa = sub.add_parser("average")
    pa.add_argument("ckpts", nargs="+")
    pa.add_argument("--out", required=True)

    pi = sub.add_parser("inspect")
    pi.add_argument("ckpt")

    args = p.parse_args(argv)
    if args.cmd == "replace-vae":
        replace_component(args.base, args.donor, args.out, "first_stage_model.")
    elif args.cmd == "replace-text":
        replace_component(args.base, args.donor, args.out, "cond_stage_model.")
    elif args.cmd == "average":
        average_checkpoints(args.ckpts, args.out)
    elif args.cmd == "inspect":
        inspect_checkpoint(args.ckpt)


if __name__ == "__main__":
    main()
