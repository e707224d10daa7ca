#!/bin/bash
# Round-4 chip queue #9 — follow-on serving measurements once the running
# int8conv exact-ladder bench frees the chip: distilled rung with conv-only
# int8, compare-modes numerics (includes the int8conv row), and the fused
# p50 latency path (params-as-arguments fix from 836916f, never yet run to
# completion on the chip).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait (up to 1h) for the in-flight int8conv_exact bench to record its rc
for i in $(seq 360); do
  grep -q "int8conv_exact rc=" /tmp/r4logs/queue8.log && break
  sleep 10
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue8.log
  timeout 3600 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue8.log
}

run int8conv_dist   bench.py --quant int8conv --ddim-steps 10 --cfg-scale 1.0
run compare_modes9  tools/compare_modes.py
run p50_fused2      tools/bench_raw.py --fused
echo "QUEUE9 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue8.log
