#!/usr/bin/env bash
# One-command real-weight fidelity gate (round-4 verdict item 10).
#
# The day the pretrained assets appear, this script (a) dumps the
# torch-side goldens, (b) runs the asset-gated real-weight test tier
# (tests/test_real_weights.py — the BASELINE.md "ID cosine within 1% of
# the PyTorch reference" gate), and (c) runs a small gen_eval batch
# end-to-end. Until then it prints exactly which assets are missing.
#
# Usage:
#   ADAPROMPT_SD_CKPT=sd15.ckpt \
#   ADAPROMPT_ADAFACE_CKPT=embeddings_gs-120000.pt \
#   ADAPROMPT_ARC2FACE_ENCODER=models/arc2face/encoder \
#   ADAPROMPT_TOKENIZER_DIR=<dir with vocab.json+merges.txt> \
#   ADAPROMPT_ARCFACE_ONNX=antelopev2/glintr100.onnx \
#   ADAPROMPT_REF_PHOTOS=subjects-celebrity/taylorswift \
#   tools/run_fidelity_gate.sh [--skip-gen-eval]
#
# Optional: ADAPROMPT_GOLDENS (default /tmp/adaprompt_goldens.npz — dumped
# fresh unless it already exists), ADAPROMPT_GATE_OUT (eval output dir).

set -euo pipefail
cd "$(dirname "$0")/.."

GOLDENS="${ADAPROMPT_GOLDENS:-/tmp/adaprompt_goldens.npz}"
OUT="${ADAPROMPT_GATE_OUT:-/tmp/adaprompt_fidelity_eval}"

missing=()
for v in ADAPROMPT_SD_CKPT ADAPROMPT_ADAFACE_CKPT ADAPROMPT_ARC2FACE_ENCODER \
         ADAPROMPT_TOKENIZER_DIR ADAPROMPT_ARCFACE_ONNX ADAPROMPT_REF_PHOTOS; do
  val="${!v:-}"
  if [[ -z "$val" || ! -e "$val" ]]; then
    missing+=("$v=${val:-<unset>}")
  fi
done
if (( ${#missing[@]} )); then
  echo "fidelity gate BLOCKED — missing assets:" >&2
  printf '  %s\n' "${missing[@]}" >&2
  exit 2
fi

echo "== [1/3] torch-side goldens -> $GOLDENS"
if [[ -f "$GOLDENS" ]]; then
  echo "   (exists, reusing; delete to re-dump)"
else
  python tools/dump_goldens.py \
    --sd_ckpt "$ADAPROMPT_SD_CKPT" \
    --adaface_ckpt "$ADAPROMPT_ADAFACE_CKPT" \
    --arc2face_encoder "$ADAPROMPT_ARC2FACE_ENCODER" \
    --tokenizer_dir "$ADAPROMPT_TOKENIZER_DIR" \
    --photos "$ADAPROMPT_REF_PHOTOS" \
    --arcface_onnx "$ADAPROMPT_ARCFACE_ONNX" \
    --out "$GOLDENS"
fi

echo "== [2/3] real-weight test tier (ID-cosine gate)"
ADAPROMPT_TEST_PLATFORM=tpu ADAPROMPT_GOLDENS="$GOLDENS" \
  python -m pytest tests/test_real_weights.py -v

if [[ "${1:-}" != "--skip-gen-eval" ]]; then
  echo "== [3/3] gen_eval smoke batch -> $OUT"
  # subjects_root = parent of the single reference-photo dir; evaluate just
  # that subject with a short prompt list (full runs drop --max_prompts)
  python -m adaprompt_tpu.cli.gen_eval \
    --ckpt "$ADAPROMPT_SD_CKPT" \
    --tokenizer_dir "$ADAPROMPT_TOKENIZER_DIR" \
    --adaface_ckpt "$ADAPROMPT_ADAFACE_CKPT" \
    --arcface_ckpt "$ADAPROMPT_ARCFACE_ONNX" \
    --subjects_root "$(dirname "$ADAPROMPT_REF_PHOTOS")" \
    --subjects "$(basename "$ADAPROMPT_REF_PHOTOS")" \
    --outdir "$OUT" --max_prompts 4 --n_per_prompt 2
fi
echo "== fidelity gate COMPLETE"
