#!/usr/bin/env bash
# Serving-mode test bench: reduced-step DDIM + CFG interval + fast attention.
# The exact-protocol ladder and the measured throughput of each rung are in
# BENCH_LOG.md; quality deltas vs the exact protocol come from
# tools/compare_modes.py (rerun with trained checkpoints).
set -euo pipefail
CKPT=${CKPT:-}
DATASET=${DATASET:-dataset/FaceData/CelebAMask-HQ}
OUT=${OUT:-results/serving}
STEPS=${STEPS:-15}
CFG_STEPS=${CFG_STEPS:-8}
ARGS=(--ddim-steps "$STEPS" --cfg-steps "$CFG_STEPS" --attn fast
      --scale 3.0 --n-samples 10 --seed 42)
[ -n "$CKPT" ] && ARGS+=(--ckpt "$CKPT")
python -m reface_tpu.cli.inference_test_bench "${ARGS[@]}" \
  --dataset celeba --dataset-dir "$DATASET" --outdir "$OUT"
