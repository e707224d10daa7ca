#!/bin/bash
# Round-5 chip queue #3 — re-runs and ladder-top combinations:
#  - causal_int8conv uncontended re-run (the queue-1 window shared the host
#    with CPU jobs; BENCH_LOG treats that number as a lower bound)
#  - distilled-5 + int8conv + causal: the serving ladder's top rung with
#    the tunnel RTT amortized away (what a production host would see)
# Waits for queue2 so the host is quiet during the timed windows.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5logs

for i in $(seq 1440); do
  grep -q "QUEUE2 DONE" /tmp/r5logs/queue2.log 2>/dev/null && break
  sleep 20
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r5logs/queue3.log
  timeout 7200 python "$@" > /tmp/r5logs/$name.out 2> /tmp/r5logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r5logs/queue3.log
  sleep 45
}

run causal_int8conv_rerun bench.py --causal 2 --quant int8conv
run dist5_causal_int8conv bench.py --steps 5 --cfg-scale 1.0 \
    --quant int8conv --causal 2
echo "QUEUE3 DONE $(date +%H:%M:%S)" >> /tmp/r5logs/queue3.log
