#!/usr/bin/env bash
# Eval entrypoint (reference evaluate_all.sh equivalent).
set -euo pipefail
RESULTS=${1:-results/celeba/results}
DATASET_DIR=${2:-dataset/FaceData/CelebAMask-HQ}
shift 2 || true
python -m reface_tpu.cli.evaluate --results-dir "$RESULTS" \
  --dataset-dir "$DATASET_DIR" --dataset celeba \
  --metrics fid id pose expression "$@"
