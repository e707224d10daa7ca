#!/usr/bin/env bash
# Video entrypoint (reference inference_video_swap.sh equivalent):
# DDIM-30, CFG 3, frame batch 10.
set -euo pipefail
VIDEO=${1:?usage: inference_video_swap.sh VIDEO SOURCE [OUTDIR]}
SOURCE=${2:?}
OUT=${3:-results/video}
shift 3 || shift 2
python -m reface_tpu.cli.video_swap --video "$VIDEO" --source "$SOURCE" \
  --outdir "$OUT" --ddim-steps 30 --scale 3.0 --frame-batch 10 "$@"
