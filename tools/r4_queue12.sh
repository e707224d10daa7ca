#!/bin/bash
# Round-4 chip queue #12 — fused single-swap latency under conv-only int8
# (the preferred quant rung): new program, fresh compile expected.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait (up to 2h) for queue11 (chip resume re-proof) to release the chip
for i in $(seq 720); do
  grep -q "QUEUE11 DONE" /tmp/r4logs/queue10.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue10.log
  timeout 3600 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue10.log
}

run p50_fused_int8conv tools/bench_raw.py --fused --quant int8conv
echo "QUEUE12 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue10.log
