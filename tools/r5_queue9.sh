#!/bin/bash
# Round-5 queue 9: serving-ladder top extension, run AFTER r5_resume.sh's
# ALL DONE (uncontended chip windows).
#   a. distilled-2 rung: distill_schedule_plan(50, 2) = [10, 2], so a
#      2-step guidance-folded student is plan-supported; measure its
#      schedule's throughput at real 860M width (conservative + causal +
#      int8conv) — the rung right above the fixed-cost bound.
#   b. batch-16 at distilled-5: without CFG the effective UNet batch at
#      --batch 8 is 8 (half the exact protocol's CFG-16 MXU knee);
#      batch 16 restores the knee and halves the per-batch RTT share.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/.r5logs
mkdir -p $LOG

# queue9 starts when the orchestrator's chip work ends ("BENCH DONE") and
# overlaps its host-only pytest/multichip validation; renice those to 19 so
# the timed chip windows here keep the core (their own validity doesn't
# depend on wall time). Re-applied each run in case pytest restarts.
denice() { for p in $(pgrep -f "pytest|graft_entry" 2>/dev/null); do renice -n 19 -p "$p" >/dev/null 2>&1; done; }

run() {
  name=$1; shift
  denice
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> $LOG/queue9.log
  timeout 7200 python "$@" > $LOG/$name.out 2> $LOG/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> $LOG/queue9.log
  sleep 45
}

run dist2_bf16        bench.py --steps 2 --cfg-scale 1.0
run dist2_causal      bench.py --steps 2 --cfg-scale 1.0 --causal 2
run dist2_int8conv    bench.py --steps 2 --cfg-scale 1.0 --quant int8conv
run dist5_b16         bench.py --steps 5 --cfg-scale 1.0 --batch 16
run dist5_b16_causal  bench.py --steps 5 --cfg-scale 1.0 --batch 16 --causal 2

# Full reference protocol scale: 1000 frozen pairs (inference_test_bench.sh
# pair shape) with exact-ERT landmarks + full PNG writing, then the four
# metrics over the complete result set. /tmp/celeba_bench now holds
# 28000-28999 + 29000-29999 @512 (regenerated); lm68.rert comes from the
# r5_resume ERT retrain.
run tb_protocol_1000 -m reface_tpu.cli.inference_test_bench \
    --dataset-dir /tmp/celeba_bench --dataset celeba \
    --outdir /tmp/tb1000_out --n-samples 8 --num-pairs 1000 \
    --landmark-rert /tmp/lm68.rert
run evaluate_1000 -m reface_tpu.cli.evaluate \
    --results-dir /tmp/tb1000_out/results --dataset-dir /tmp/celeba_bench \
    --dataset celeba --metrics fid id pose expression --allow-random \
    --out $LOG/eval1000_metrics.json
echo "QUEUE9 ALL DONE $(date +%H:%M:%S)" >> $LOG/queue9.log
