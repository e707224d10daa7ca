#!/bin/bash
# Round-5 chip queue #11 — sampler-composition rungs: the `--sampler dpm`
# reduced-step protocol (the recommended exact-ish serving mode) composed
# with the two dispatch/quant levers already proven on the DDIM rungs:
#   dpm30 + int8conv   (conv win at 30 steps; predict ~2.9)
#   dpm30 causal       (RTT-free rate of the recommended protocol)
#   dpm15 + int8conv   (the aggressive sampler rung with the conv win)
# Waits for the full-suite/multichip validation to finish so the timed
# windows are uncontended (plus the tunnel HBM grace period).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/.r5logs
mkdir -p $LOG

for i in $(seq 1440); do
  grep -qE "passed|failed|error" /tmp/pytest_full2.log 2>/dev/null \
    && grep -q "dryrun_multichip" /tmp/multichip2.log 2>/dev/null && break
  sleep 30
done
sleep 180  # HBM grace period (CLAUDE.md)

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> $LOG/queue11.log
  timeout 7200 python "$@" > $LOG/$name.out 2> $LOG/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> $LOG/queue11.log
  sleep 45
}

run dpm30_int8conv bench.py --sampler dpm --steps 30 --quant int8conv
run dpm30_causal   bench.py --sampler dpm --steps 30 --causal 2
run dpm15_int8conv bench.py --sampler dpm --steps 15 --quant int8conv
echo "QUEUE11 ALL DONE $(date +%H:%M:%S)" >> $LOG/queue11.log
