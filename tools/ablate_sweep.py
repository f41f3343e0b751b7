"""End-to-end ablation sweep: runs bench.py once per ADAPROMPT_ABLATE
config (sequentially — never two TPU jobs at once) and prints the table.

Usage: python tools/ablate_sweep.py [config ...]
Default configs: '', self, cross, ff, res, vae, self,cross,ff,res
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(ablate, batches="8", iters="3"):
    env = dict(os.environ,
               ADAPROMPT_BENCH_BATCHES=batches,
               ADAPROMPT_BENCH_ITERS=iters)
    if ablate:
        env["ADAPROMPT_ABLATE"] = ablate
    else:
        env.pop("ADAPROMPT_ABLATE", None)
    res = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=1200)
    if res.returncode != 0:
        return {"error": res.stderr[-500:]}
    return json.loads(res.stdout.strip().splitlines()[-1])


def main():
    configs = sys.argv[1:] or ["", "self", "cross", "ff", "res", "vae",
                               "self,cross,ff,res"]
    results = []
    for cfg in configs:
        out = run(cfg)
        label = cfg or "baseline"
        if "error" in out:
            print(f"{label:24s} ERROR {out['error']}", flush=True)
            continue
        results.append((label, out["value"]))
        print(f"{label:24s} {out['value']:.3f} img/s", flush=True)
    if results and results[0][0] == "baseline":
        base = results[0][1]
        print("\nattribution (time share of baseline):")
        for label, v in results[1:]:
            share = 1.0 - base / v
            print(f"  {label:22s} {share * 100:5.1f}%")


if __name__ == "__main__":
    main()
