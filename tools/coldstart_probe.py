"""Cold vs warm serving start: quantify the persistent compile cache.

VERDICT r3 #4. Every CLI/bench entry point sets
`jax_compilation_cache_dir` (cli/common.py, bench.py); this probe measures
what that buys: the FIRST generate() call of a fresh process at an
already-seen (batch, steps, size) signature, with

  cold: an empty cache directory (full XLA compile), vs
  warm: the populated default cache (compiles replayed from disk).

Each measurement runs in a SUBPROCESS so no in-process jit cache can leak
between them. The model is random-init full-size SD-1.5 (same graphs as
trained weights); param-init time is reported separately so the number
isolates compile + load.

Usage: python tools/coldstart_probe.py [--batch 1] [--steps 5]
       [--sampler ddim]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["PROBE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from adaprompt_tpu.pipeline import StableDiffusionPipeline

t0 = time.perf_counter()
pipe = StableDiffusionPipeline.random_init(0, param_dtype=jnp.bfloat16)
t_init = time.perf_counter() - t0

batch = int(os.environ["PROBE_BATCH"]); steps = int(os.environ["PROBE_STEPS"])
t0 = time.perf_counter()
imgs = pipe.generate(["a portrait"] * batch, num_steps=steps,
                     height=512, width=512, seed=0,
                     sampler=os.environ["PROBE_SAMPLER"])
np.asarray(imgs)
t_first = time.perf_counter() - t0
print(json.dumps({"init_s": round(t_init, 1), "first_call_s": round(t_first, 1)}))
"""


def run(cache_dir, batch, steps, sampler):
    env = dict(os.environ, PROBE_CACHE=cache_dir, PROBE_BATCH=str(batch),
               PROBE_STEPS=str(steps), PROBE_SAMPLER=sampler)
    out = subprocess.run([sys.executable, "-c", _CHILD], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--sampler", default="ddim")
    ap.add_argument("--warm_cache",
                    default=os.path.expanduser("~/.cache/adaprompt_jax"))
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as cold_dir:
        print("cold start (empty cache) ...", file=sys.stderr, flush=True)
        cold = run(cold_dir, args.batch, args.steps, args.sampler)
        # the cold child just POPULATED cold_dir: re-running against it is
        # the warm measurement with an identical cache state provenance
        print("warm start (cache populated by the cold run) ...",
              file=sys.stderr, flush=True)
        warm = run(cold_dir, args.batch, args.steps, args.sampler)

    print(json.dumps({
        "signature": f"b{args.batch}/steps{args.steps}/{args.sampler}/512",
        "cold_first_call_s": cold["first_call_s"],
        "warm_first_call_s": warm["first_call_s"],
        "speedup": round(cold["first_call_s"] / max(warm["first_call_s"], 1e-9), 1),
        "param_init_s": warm["init_s"],
    }))


if __name__ == "__main__":
    main()
