#!/usr/bin/env bash
# Test-bench entrypoint (reference inference_test_bench.sh equivalent):
# CelebA + FFHQ, DDIM-50, CFG 3.0, batch 10, 1000 pairs each.
set -euo pipefail
CKPT=${CKPT:-}
CELEBA=${CELEBA:-dataset/FaceData/CelebAMask-HQ}
FFHQ=${FFHQ:-dataset/FaceData/FFHQ}
OUT=${OUT:-results}
ARGS=(--ddim-steps 50 --scale 3.0 --n-samples 10 --seed 42)
[ -n "$CKPT" ] && ARGS+=(--ckpt "$CKPT")
python -m reface_tpu.cli.inference_test_bench "${ARGS[@]}" \
  --dataset celeba --dataset-dir "$CELEBA" --outdir "$OUT/celeba"
python -m reface_tpu.cli.inference_test_bench "${ARGS[@]}" \
  --dataset ffhq --dataset-dir "$FFHQ" --outdir "$OUT/ffhq"
