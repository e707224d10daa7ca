#!/bin/bash
# Round-4 chip queue #10 — the corrected distilled+int8conv rung (queue9's
# run died on a wrong flag name: bench.py takes --steps, not --ddim-steps).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue10.log
  timeout 3600 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue10.log
}

run int8conv_dist2 bench.py --quant int8conv --steps 10 --cfg-scale 1.0
echo "QUEUE10 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue10.log
