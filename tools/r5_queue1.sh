#!/bin/bash
# Round-5 chip queue #1 — the measurement items that need no further code:
#  - causal overlapped-dispatch throughput (VERDICT #3): exact ladder and
#    int8conv, warm-cache programs, tunnel-RTT amortized trustworthily
#  - distilled-5 serving rung (VERDICT #2): bf16 and int8conv
#  - PLMS / DPM-Solver throughput on the chip (VERDICT #6)
#  - compare_modes numerics incl. the new plms/dpm rows (VERDICT #6)
#  - EMA at real size with the bf16 shadow (VERDICT #4)
#  - video chip-bound ceiling via --bench-ram (VERDICT #7)
# Ordering: warm-cache items first (fast, low risk), fresh compiles after.
# sleep between runs: HBM freed by an exiting process lingers tunnel-side
# (CLAUDE.md grace-period quirk).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5logs

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r5logs/queue1.log
  timeout 7200 python "$@" > /tmp/r5logs/$name.out 2> /tmp/r5logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r5logs/queue1.log
  sleep 45
}

# warm-cache first (the exact bf16 batch-8 program is cached from round 4)
run causal_exact    bench.py --causal 2
run causal_int8conv bench.py --causal 2 --quant int8conv
# distilled-5 rung: 5 steps, no CFG (guidance-folded student schedule)
run dist5           bench.py --steps 5 --cfg-scale 1.0
run dist5_int8conv  bench.py --steps 5 --cfg-scale 1.0 --quant int8conv
run dist5_causal    bench.py --steps 5 --cfg-scale 1.0 --causal 2
# sampler ladder rows (fresh compiles, ~15 min each over the tunnel)
run plms50          bench.py --sampler plms
run dpm30           bench.py --sampler dpm --steps 30
run dpm15           bench.py --sampler dpm --steps 15
# numerics incl. new plms/dpm rows (batch 4; older rows warm)
run compare_modes   tools/compare_modes.py
# EMA at real size: eps config + bf16 shadow on the 16G chip
run train_ema_bf16  -m reface_tpu.cli.train --dataset-dir /tmp/celeba512 \
                    --logdir /tmp/trainema5 --batch-size 1 --steps 12 \
                    --train-count 24 --mu-dtype bfloat16 \
                    --base-lr 1e-4 --warmup-steps 5 --log-every 2 \
                    --ckpt-every 1000 --image-log-every 1000000 \
                    --ema-decay 0.9999 --ema-dtype bfloat16 --epochs 1000
# video chip-bound ceiling: RAM frames in, no writer/x264 (720p clip)
run video_ram       -m reface_tpu.cli.video_swap --video /tmp/clip720.mp4 \
                    --source /tmp/celeba_bench/CelebA-HQ-img/29000.jpg \
                    --outdir /tmp/r5_vram --frame-batch 10 --frames 110 \
                    --bench-ram
echo "QUEUE1 DONE $(date +%H:%M:%S)" >> /tmp/r5logs/queue1.log
