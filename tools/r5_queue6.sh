#!/bin/bash
# Round-5 chip queue #6 — EMA at real size, take 3 (VERDICT #4).
# Round-4 found fp32 shadows OOM (+3.4G); queue1's bf16-shadow retry
# STILL OOMed at the first step's execution. Root cause: the monolithic
# eps step was jitted without donation, double-buffering the whole
# TrainState (~10.2G with EMA) at the step boundary. This queue runs the
# donated lowering: (1) the AOT probe prints XLA's buffer assignment for
# the donated eps+EMA program (compile lands in the persistent cache),
# (2) the real 12-step run reuses that compile and records ms/step.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5logs

for i in $(seq 1440); do
  grep -q "QUEUE5 DONE" /tmp/r5logs/queue5.log 2>/dev/null && break
  sleep 20
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r5logs/queue6.log
  timeout 7200 python "$@" > /tmp/r5logs/$name.out 2> /tmp/r5logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r5logs/queue6.log
  sleep 45
}

run probe_ema_mem tools/probe_step_mem.py --batch 1 \
    --mu-dtype bfloat16 --ema-decay 0.9999 --ema-dtype bfloat16
run train_ema_donate -m reface_tpu.cli.train \
    --dataset-dir /tmp/celeba512 --logdir /tmp/trainema6 \
    --batch-size 1 --steps 12 --train-count 24 \
    --mu-dtype bfloat16 --base-lr 1e-4 --warmup-steps 5 \
    --log-every 2 --ckpt-every 1000 --image-log-every 1000000 \
    --ema-decay 0.9999 --ema-dtype bfloat16 --epochs 1000
echo "QUEUE6 DONE $(date +%H:%M:%S)" >> /tmp/r5logs/queue6.log
