#!/bin/bash
# Round-4 chip queue #6 — re-runs of the four queue5 failures, with fixes:
#  - train50/train_resume: force_unet_remat now active (the queue5 run
#    predated the fix and compiled the 11.53G un-remat'd pull program);
#    EMA dropped — reference parity is use_ema False (train.yaml:19) and
#    a full fp32 EMA copy (+3.4G) was never part of the proven-fit budget
#  - train_ema_eps: demonstrates EMA updating on-chip in the eps-only
#    config, which has the headroom for the fp32 EMA tree
#  - distill_rs: student attention now resolves to the differentiable
#    flash path (queue5 died in linearization on the smalld kernel)
#  - p50_fused: params are jit ARGUMENTS now (queue5 baked 2.67G of
#    constants into the MLIR and broke the remote-compile upload)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r4logs

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue6.log
  timeout 7200 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue6.log
}

rm -rf /tmp/trainrun
run train50        -m reface_tpu.cli.train --dataset-dir /tmp/celeba512 \
                   --logdir /tmp/trainrun --batch-size 1 --steps 50 \
                   --train-count 24 --full-losses --split-grad 2 \
                   --mu-dtype bfloat16 --split-acc-dtype bfloat16 \
                   --base-lr 1e-4 --warmup-steps 10 --log-every 5 \
                   --ckpt-every 25 --image-log-every 1000000 --epochs 1000
run train_resume   -m reface_tpu.cli.train --dataset-dir /tmp/celeba512 \
                   --logdir /tmp/trainrun --batch-size 1 --steps 60 \
                   --train-count 24 --full-losses --split-grad 2 \
                   --mu-dtype bfloat16 --split-acc-dtype bfloat16 \
                   --base-lr 1e-4 --warmup-steps 10 --log-every 5 \
                   --ckpt-every 1000 --image-log-every 1000000 --epochs 1000 \
                   --resume /tmp/trainrun/checkpoints/last
run p50_fused      tools/bench_raw.py --fused
run distill_rs     -m reface_tpu.cli.distill --out /tmp/distill_rs \
                   --steps-per-round 4 --batch-size 1 --log-every 1 \
                   --max-rounds 1 --teacher-dtype bfloat16 \
                   --mu-dtype bfloat16
run train_ema_eps  -m reface_tpu.cli.train --dataset-dir /tmp/celeba512 \
                   --logdir /tmp/trainema --batch-size 1 --steps 15 \
                   --train-count 24 --mu-dtype bfloat16 \
                   --base-lr 1e-4 --warmup-steps 5 --log-every 5 \
                   --ckpt-every 1000 --image-log-every 1000000 \
                   --ema-decay 0.9999 --epochs 1000
echo "QUEUE6 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue6.log
