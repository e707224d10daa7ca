#!/bin/bash
# Round-4 chip queue #14 — execute the batched test-bench driver (the
# reference's primary inference workload, inference_test_bench.sh) at real
# size on the chip: synthetic CelebA-HQ frozen pairs (/tmp/celeba_bench),
# one batch of 8 pairs at DDIM-50 CFG 3.0 with aux dumps. Random weights
# (no checkpoints ship here) — an executes-at-scale proof for the driver:
# loader, mask recipe, jitted batch swap, PNG/grid writing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue10.log
  timeout 3600 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue10.log
}

run test_bench_real -m reface_tpu.cli.inference_test_bench \
  --dataset-dir /tmp/celeba_bench --dataset celeba --outdir /tmp/tb_out \
  --n-samples 8 --num-pairs 8 --save-aux
echo "QUEUE14 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue10.log
