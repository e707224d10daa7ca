#!/usr/bin/env bash
# Training entrypoint (reference train.sh equivalent): CelebA-HQ, full losses.
set -euo pipefail
DATASET_DIR=${1:-dataset/FaceData/CelebAMask-HQ}
LOGDIR=${2:-logs/$(date +%Y%m%dT%H%M%S)_reface}
python -m reface_tpu.cli.train \
  --dataset-dir "$DATASET_DIR" --dataset celeba --logdir "$LOGDIR" \
  --batch-size 1 --base-lr 1e-5 --warmup-steps 10000 --epochs 20 \
  --full-losses "$@"
