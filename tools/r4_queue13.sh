#!/bin/bash
# Round-4 chip queue #13 — sanity re-run of the default headline bench
# (exact bf16 DDIM-50 protocol) after this round's code changes, so the
# driver's end-of-round BENCH_r04 run hits a verified warm cache.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 720); do
  grep -q "QUEUE12 DONE" /tmp/r4logs/queue10.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue10.log
  timeout 3600 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue10.log
}

run bench_default bench.py
echo "QUEUE13 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue10.log
