#!/bin/bash
# Round-4 chip measurement queue #5 — the remainder of queue4 (killed with
# the session at unet_int8_noxf) plus the NEW fused single-dispatch raw
# path: sustained 50-step full-loss training + resume round-trip, ONE
# real-size distillation step, fused/eager p50 latency + stage breakdown,
# the final int8 conv attribution ablation, int8 numerics deltas, one
# real-size guided swap. Serialized: one chip, one tunnel.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r4logs

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue5.log
  timeout 7200 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue5.log
}

run train50        -m reface_tpu.cli.train --dataset-dir /tmp/celeba512 \
                   --logdir /tmp/trainrun --batch-size 1 --steps 50 \
                   --train-count 24 --full-losses --split-grad 2 \
                   --mu-dtype bfloat16 --split-acc-dtype bfloat16 \
                   --base-lr 1e-4 --warmup-steps 10 --log-every 5 \
                   --ckpt-every 25 --image-log-every 1000000 \
                   --ema-decay 0.9999 --epochs 1000
run train_resume   -m reface_tpu.cli.train --dataset-dir /tmp/celeba512 \
                   --logdir /tmp/trainrun --batch-size 1 --steps 60 \
                   --train-count 24 --full-losses --split-grad 2 \
                   --mu-dtype bfloat16 --split-acc-dtype bfloat16 \
                   --base-lr 1e-4 --warmup-steps 10 --log-every 5 \
                   --ckpt-every 1000 --image-log-every 1000000 \
                   --ema-decay 0.9999 --epochs 1000 \
                   --resume /tmp/trainrun/checkpoints/last
run distill_rs     -m reface_tpu.cli.distill --out /tmp/distill_rs \
                   --steps-per-round 4 --batch-size 1 --log-every 1 \
                   --teacher-dtype bfloat16 --mu-dtype bfloat16
run p50_fused      tools/bench_raw.py --fused
run unet_int8_noxf tools/bench_unet.py --quant int8 --ablate transformer
run compare_modes  tools/compare_modes.py
run guided_real    -m reface_tpu.cli.swap --target /tmp/tgt720.png \
                   --source /tmp/src720.png --outdir /tmp/guided_out \
                   --guidance id,seg --ddim-steps 50
run p50_stages     tools/bench_raw.py --stages
echo "QUEUE5 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue5.log
