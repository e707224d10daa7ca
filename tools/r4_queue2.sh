#!/bin/bash
# Round-4 chip measurement queue #2 (VERDICT items 1-4, continued):
#   int8 distilled rung, p50 single-swap latency, int8 numerics,
#   real-size distill step, sustained full-loss train rate.
# Serialized: one chip, one tunnel. int8 exact already measured by queue1
# (1.723 swaps/s, /tmp/r4logs/int8_exact.out).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r4logs

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue2.log
  timeout 5400 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue2.log
}

run int8_distilled bench.py --steps 10 --cfg-scale 1.0 --quant int8
run p50_raw        tools/bench_raw.py
run compare_modes  tools/compare_modes.py
run distill_real   -m reface_tpu.cli.distill --out /tmp/distill_real \
                   --steps-per-round 3 --batch-size 1 --log-every 1
run train_full     tools/bench_train_step.py --full-losses --split-grad 2 \
                   --mu-dtype bfloat16 --acc-dtype bfloat16 --steps 20
echo "QUEUE2 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue2.log
