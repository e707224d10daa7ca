#!/bin/bash
# Round-4 chip measurement queue #3 (VERDICT items 3, 5, 6):
#   end-to-end video throughput, int8/bf16 conv-vs-transformer attribution
#   (chain bench with component ablation), sustained 50-step full-loss
#   training run + resume round-trip, one real-size guided swap.
# Inputs generated beforehand: /tmp/clip720.mp4, /tmp/celeba512.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r4logs

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue3.log
  timeout 7200 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue3.log
}

run video          -m reface_tpu.cli.video_swap --video /tmp/clip720.mp4 \
                   --source /tmp/src.png --outdir /tmp/vout720 \
                   --frame-batch 10 --bench-json
run unet_bf16      tools/bench_unet.py
run unet_int8      tools/bench_unet.py --quant int8
run unet_bf16_noxf tools/bench_unet.py --ablate transformer
run unet_int8_noxf tools/bench_unet.py --quant int8 --ablate transformer
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
run guided_real    -m reface_tpu.cli.swap --target /tmp/tgt720.png \
                   --source /tmp/src720.png --outdir /tmp/guided_out \
                   --guidance id,seg --ddim-steps 50
echo "QUEUE3 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue3.log
