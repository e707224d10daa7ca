#!/usr/bin/env bash
# Demo GUI entrypoint (reference Demo.sh equivalent).
set -euo pipefail
python -m reface_tpu.cli.demo_server --port "${PORT:-7860}" \
  --ddim-steps 50 --scale 3.5 "$@"
