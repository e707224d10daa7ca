#!/bin/bash
# Round-4 chip queue #7 — conv-only int8 (--quant int8conv) A/B: the
# chain ablation predicts ~47.8 ms/fwd (bf16 transformer 26.7 + int8 conv
# side 21.1) vs 50.16 bf16 / 49.26 full-int8, with strictly tighter
# numerics (transformer math stays exact bf16). Measure the UNet chain,
# the exact ladder, the distilled rung, and the numerics deltas.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r4logs

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue7.log
  timeout 7200 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue7.log
}

run unet_int8conv       tools/bench_unet.py --quant int8conv
run int8conv_exact      bench.py --quant int8conv
run int8conv_distilled  bench.py --quant int8conv --ddim-steps 10 --cfg-scale 1.0
run compare_modes7      tools/compare_modes.py
echo "QUEUE7 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue7.log
