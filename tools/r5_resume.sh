#!/bin/bash
# Round-5 resume orchestrator: the container restart wiped /tmp (queue logs,
# generated assets) and the .jax_cache, so queues 3-8 never ran. This
# re-runs their work in VALUE order (highest-priority VERDICT items first,
# in case the wall clock runs out again), sequentially so every timed chip
# window is uncontended on this 1-core host:
#   0. regenerate /tmp assets (host)
#   1. queue6: EMA at real size with the donated lowering (VERDICT #4)
#   2. queue7a/b: video one-XLA-program re-measure, RAM + e2e (VERDICT #7)
#   3. queue3: uncontended causal int8conv + distilled-5 ladder top
#   4. queue4: fused distilled-10/5 single-swap latency rungs
#   5. queue5: uncontended dpm30 re-run
#   6. ERT retrain (host) + queue7c video ERT variant
#   7. plain bench.py (warms the driver's exact-program cache + fresh
#      ladder verification)
#   8. queue8: full pytest + multichip dryrun (host)
# Logs land in /root/repo/.r5logs (inside the repo: survives /tmp wipes).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/.r5logs
mkdir -p $LOG

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> $LOG/resume.log
  timeout 7200 python "$@" > $LOG/$name.out 2> $LOG/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> $LOG/resume.log
  sleep 45
}

# --- 0. assets ---
run assets tools/r5_assets.py

# --- 1. EMA at real size, donated lowering (queue6) ---
run probe_ema_mem tools/probe_step_mem.py --batch 1 \
    --mu-dtype bfloat16 --ema-decay 0.9999 --ema-dtype bfloat16
run train_ema_donate -m reface_tpu.cli.train \
    --dataset-dir /tmp/celeba512 --logdir /tmp/trainema6 \
    --batch-size 1 --steps 12 --train-count 24 \
    --mu-dtype bfloat16 --base-lr 1e-4 --warmup-steps 5 \
    --log-every 2 --ckpt-every 1000 --image-log-every 1000000 \
    --ema-decay 0.9999 --ema-dtype bfloat16 --epochs 1000
echo "EMA DONE $(date +%H:%M:%S)" >> $LOG/resume.log

# --- 2. video one-program re-measure (queue7 a+b) ---
run video_ram_onep  -m reface_tpu.cli.video_swap --video /tmp/clip720.mp4 \
                    --source /tmp/celeba_bench/CelebA-HQ-img/29000.jpg \
                    --outdir /tmp/r5_vram2 --frame-batch 10 --frames 110 \
                    --bench-ram
run video_e2e_onep  -m reface_tpu.cli.video_swap --video /tmp/clip720.mp4 \
                    --source /tmp/celeba_bench/CelebA-HQ-img/29000.jpg \
                    --outdir /tmp/r5_ve2e --frame-batch 10 --frames 110 \
                    --bench-json
echo "VIDEO AB DONE $(date +%H:%M:%S)" >> $LOG/resume.log

# --- 3. queue3: ladder-top uncontended re-runs ---
run causal_int8conv_rerun bench.py --causal 2 --quant int8conv
run dist5_causal_int8conv bench.py --steps 5 --cfg-scale 1.0 \
    --quant int8conv --causal 2
echo "QUEUE3 DONE $(date +%H:%M:%S)" >> $LOG/resume.log

# --- 4. queue4: fused distilled latency rungs ---
run p50_fused_dist10 tools/bench_raw.py --fused --steps 10 --cfg-scale 1.0
run p50_fused_dist5  tools/bench_raw.py --fused --steps 5 --cfg-scale 1.0
echo "QUEUE4 DONE $(date +%H:%M:%S)" >> $LOG/resume.log

# --- 5. queue5: dpm30 uncontended re-run ---
run dpm30_rerun bench.py --sampler dpm --steps 30
echo "QUEUE5 DONE $(date +%H:%M:%S)" >> $LOG/resume.log

# --- 6. ERT retrain (host-only) + video ERT variant (queue7c) ---
run ert_retrain tools/ert_train.py --out /tmp/lm68.rert \
    --n-train 1500 --n-val 200 --size 256 --cascades 10 --trees 100 \
    --depth 4 --feats 300 --oversample 4 --dump-data /tmp/lmfaces.npz
run video_ram_ert -m reface_tpu.cli.video_swap --video /tmp/clip720.mp4 \
                  --source /tmp/celeba_bench/CelebA-HQ-img/29000.jpg \
                  --outdir /tmp/r5_vram3 --frame-batch 10 --frames 110 \
                  --bench-ram --landmark-rert /tmp/lm68.rert
echo "ERT DONE $(date +%H:%M:%S)" >> $LOG/resume.log

# --- 7. plain bench: warms the exact program for the driver + ladder check
run bench_exact bench.py
echo "BENCH DONE $(date +%H:%M:%S)" >> $LOG/resume.log

# --- 8. queue8: host validation ---
echo "=== pytest_full ($(date +%H:%M:%S)) ===" >> $LOG/resume.log
timeout 5400 python -m pytest tests/ -q > $LOG/pytest_full_r5.log 2>&1
echo "pytest rc=$? ($(date +%H:%M:%S))" >> $LOG/resume.log
echo "=== multichip dryrun ($(date +%H:%M:%S)) ===" >> $LOG/resume.log
timeout 3600 python __graft_entry__.py multichip 8 \
    > $LOG/multichip_r5.log 2>&1
echo "multichip rc=$? ($(date +%H:%M:%S))" >> $LOG/resume.log
echo "ALL DONE $(date +%H:%M:%S)" >> $LOG/resume.log
