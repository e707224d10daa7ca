#!/bin/bash
# Round-5 chip queue #10 — ladder-top composition rungs, run AFTER queue9's
# ALL DONE (waits for it, then a grace period for tunnel-side HBM release):
#   a. distilled-2 + int8conv, causal-overlapped: composes the two best
#      distilled-2 levers (bf16 causal 27.96, int8conv conservative 26.91)
#      — the candidate new ladder top.
#   b. fused single-swap p50 at the distilled-2 schedule: extends the
#      latency column below the distilled-5 0.205 s rung (predict ~0.17 s:
#      2 x ~11 ms steps + ~0.15 s fixed raw-path cost).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/.r5logs
mkdir -p $LOG

for i in $(seq 1440); do
  grep -q "QUEUE9 ALL DONE" $LOG/queue9.log 2>/dev/null && break
  sleep 20
done
sleep 120  # HBM grace period (CLAUDE.md: freed memory lingers tunnel-side)

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> $LOG/queue10.log
  timeout 7200 python "$@" > $LOG/$name.out 2> $LOG/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> $LOG/queue10.log
  sleep 45
}

run dist2_causal_int8conv bench.py --steps 2 --cfg-scale 1.0 --causal 2 --quant int8conv
run p50_fused_dist2       tools/bench_raw.py --fused --steps 2 --cfg-scale 1.0
echo "QUEUE10 ALL DONE $(date +%H:%M:%S)" >> $LOG/queue10.log
