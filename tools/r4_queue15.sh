#!/bin/bash
# Round-4 chip queue #15 — the evaluate_all.sh protocol at real size on the
# chip over the queue14 test-bench results: CLIP-FID + ID retrieval + pose +
# expression with random-init towers (--allow-random; no eval checkpoints
# ship in this environment). Executes-at-scale proof for cli/evaluate.py.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 720); do
  grep -q "QUEUE14 DONE" /tmp/r4logs/queue10.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue10.log
  timeout 3600 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue10.log
}

run evaluate_real -m reface_tpu.cli.evaluate \
  --results-dir /tmp/tb_out/results --dataset-dir /tmp/celeba_bench \
  --dataset celeba --metrics fid id pose expression --allow-random \
  --out /tmp/r4logs/eval_metrics.json
echo "QUEUE15 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue10.log
