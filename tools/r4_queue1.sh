#!/bin/bash
# Round-4 chip measurement queue #1 (VERDICT items 1, 2):
#   int8 exact ladder, int8 distilled rung, p50 single-swap latency,
#   int8 numerics deltas. Serialized: one chip, one tunnel.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r4logs

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue1.log
  timeout 3600 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue1.log
}

run int8_exact      bench.py --quant int8
run int8_distilled  bench.py --quant int8 --ddim-steps 10 --cfg-scale 1.0
run p50_raw         tools/bench_raw.py
run compare_modes   tools/compare_modes.py
echo "QUEUE1 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue1.log
