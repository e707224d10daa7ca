#!/bin/bash
# Round-5 chip queue #2 — the landmark-fidelity campaign (VERDICT #1) +
# protocol-scale test bench (VERDICT #5) + the fixed-cost attack A/B
# (VERDICT #2). Waits for queue1 so its bench timings stay uncontended.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5logs

for i in $(seq 1440); do
  grep -q "QUEUE1 DONE" /tmp/r5logs/queue1.log 2>/dev/null && break
  sleep 20
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r5logs/queue2.log
  timeout 7200 python "$@" > /tmp/r5logs/$name.out 2> /tmp/r5logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r5logs/queue2.log
  sleep 45
}

# --- landmark campaign (SURVEY hard-part #1 numbers) ---
# 1. train a REAL ERT on synthetic faces with exact GT (CPU, numpy);
#    prints ERT-vs-GT val px error; dumps the faces npz for distillation
run ert_campaign tools/ert_train.py --out /tmp/lm68.rert \
    --n-train 1500 --n-val 200 --size 256 --cascades 10 --trees 100 \
    --depth 4 --feats 300 --oversample 4 --dump-data /tmp/lmfaces.npz
# 2. distill the full-width LandmarkNet from the ERT's labels (chip);
#    prints CNN-vs-ERT and CNN-vs-GT val px errors — the documented
#    tolerance
run lmnet_distill -m reface_tpu.cli.train_landmarks \
    --data /tmp/lmfaces.npz --rert /tmp/lm68.rert --out /tmp/lmnet_ckpt \
    --steps 4000 --batch-size 32 --lr 3e-4 --val-frac 0.118 --log-every 200
# 3. p50 re-records with the landmark source STATED in the JSON
#    (BENCH_LOG wording fix needs an honestly-labeled number)
run p50_eager_cnn tools/bench_raw.py
run p50_eager_ert tools/bench_raw.py --landmark-rert /tmp/lm68.rert

# --- protocol-scale test bench (104 frozen pairs; ref protocol is 1000
#     of exactly this shape) with exact-ERT landmark conditioning ---
run gen_tb100 -c "
from reface_tpu.data.synthetic import make_synthetic_celeba
make_synthetic_celeba('/tmp/celeba_bench100', 28000, 104, size=512, seed=10)
make_synthetic_celeba('/tmp/celeba_bench100', 29000, 104, size=512, seed=11)
print('wrote /tmp/celeba_bench100 (104 target + 104 source @512)')
"
run tb_protocol -m reface_tpu.cli.inference_test_bench \
    --dataset-dir /tmp/celeba_bench100 --dataset celeba \
    --outdir /tmp/tb100_out --n-samples 8 --num-pairs 104 \
    --landmark-rert /tmp/lm68.rert
run evaluate100 -m reface_tpu.cli.evaluate \
    --results-dir /tmp/tb100_out/results --dataset-dir /tmp/celeba_bench100 \
    --dataset celeba --metrics fid id pose expression --allow-random \
    --out /tmp/r5logs/eval100_metrics.json

# --- fixed-cost attack A/B at the distilled-5 rung (vs queue1's
#     dist5_int8conv): int8 CLIP conditioner tower on top ---
run dist5_qcond bench.py --steps 5 --cfg-scale 1.0 --quant int8conv \
    --quant-cond
echo "QUEUE2 DONE $(date +%H:%M:%S)" >> /tmp/r5logs/queue2.log
