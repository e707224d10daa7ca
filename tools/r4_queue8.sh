#!/bin/bash
# Round-4 chip queue #8 — restart of queue6 (killed with the session that
# spawned it, mid-orbax-save at step 25 of train50; losses were decreasing
# and the split-grad step rate was ~1.2 s/step incl. host data) plus the
# queue7 int8conv A/B. Changes vs queue6:
#  - launched under setsid so a session restart cannot kill it again
#  - train50 saves ONCE at step 50 (orbax save of the ~4.4G train state
#    over the tunnel took >15 min in queue6; two saves don't fit the
#    remaining round budget), then train_resume restores it for 10 steps
#  - priority order: training evidence first, serving A/Bs last, so a
#    round-end cutoff loses the cheapest items
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r4logs

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue8.log
  timeout 7200 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue8.log
}

rm -rf /tmp/trainrun
run train50        -m reface_tpu.cli.train --dataset-dir /tmp/celeba512 \
                   --logdir /tmp/trainrun --batch-size 1 --steps 50 \
                   --train-count 24 --full-losses --split-grad 2 \
                   --mu-dtype bfloat16 --split-acc-dtype bfloat16 \
                   --base-lr 1e-4 --warmup-steps 10 --log-every 5 \
                   --ckpt-every 50 --image-log-every 1000000 --epochs 1000
run train_resume   -m reface_tpu.cli.train --dataset-dir /tmp/celeba512 \
                   --logdir /tmp/trainrun --batch-size 1 --steps 60 \
                   --train-count 24 --full-losses --split-grad 2 \
                   --mu-dtype bfloat16 --split-acc-dtype bfloat16 \
                   --base-lr 1e-4 --warmup-steps 10 --log-every 5 \
                   --ckpt-every 1000 --image-log-every 1000000 --epochs 1000 \
                   --resume /tmp/trainrun/checkpoints/last
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
run p50_fused      tools/bench_raw.py --fused
run unet_int8conv  tools/bench_unet.py --quant int8conv
run int8conv_exact bench.py --quant int8conv
run int8conv_dist  bench.py --quant int8conv --ddim-steps 10 --cfg-scale 1.0
echo "QUEUE8 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue8.log
