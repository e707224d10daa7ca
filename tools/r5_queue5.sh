#!/bin/bash
# Round-5 chip queue #5 — uncontended re-runs of rows whose timed windows
# overlapped host CPU work (test runs) during queue 1: dpm30.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5logs

for i in $(seq 1440); do
  grep -q "QUEUE4 DONE" /tmp/r5logs/queue4.log 2>/dev/null && break
  sleep 20
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r5logs/queue5.log
  timeout 7200 python "$@" > /tmp/r5logs/$name.out 2> /tmp/r5logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r5logs/queue5.log
  sleep 45
}

run dpm30_rerun bench.py --sampler dpm --steps 30
echo "QUEUE5 DONE $(date +%H:%M:%S)" >> /tmp/r5logs/queue5.log
