#!/bin/bash
# Round-5 chip queue #4 — distilled-schedule single-swap LATENCY rungs:
# the fused one-XLA-program raw path (round-4 p50 0.944 s at DDIM-50
# CFG 3.5) composed with the distilled student schedules (10 and 5 steps,
# guidance folded, single conditional forward/step). Completes the
# serving story's latency column: bf16 fused is the latency config
# (quant loses at batch 1), distillation is the only lever below 0.94 s
# on one chip.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5logs

for i in $(seq 1440); do
  grep -q "QUEUE3 DONE" /tmp/r5logs/queue3.log 2>/dev/null && break
  sleep 20
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r5logs/queue4.log
  timeout 7200 python "$@" > /tmp/r5logs/$name.out 2> /tmp/r5logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r5logs/queue4.log
  sleep 45
}

run p50_fused_dist10 tools/bench_raw.py --fused --steps 10 --cfg-scale 1.0
run p50_fused_dist5  tools/bench_raw.py --fused --steps 5 --cfg-scale 1.0
echo "QUEUE4 DONE $(date +%H:%M:%S)" >> /tmp/r5logs/queue4.log
