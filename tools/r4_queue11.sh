#!/bin/bash
# Round-4 chip queue #11 — re-prove the full-state --resume on the chip
# AFTER fix 5bde654 (free fresh-init device params post-restore). The only
# chip-level resume attempt (queue8 train_resume) predates the fix and hit
# RESOURCE_EXHAUSTED on the first resumed step. Same command, 10 more steps,
# no checkpoint save at the end (ckpt-every 1000).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait (up to 1h) for queue10 to finish so the chip + host are uncontended
for i in $(seq 360); do
  grep -q "QUEUE10 DONE" /tmp/r4logs/queue10.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r4logs/queue10.log
  timeout 7200 python "$@" > /tmp/r4logs/$name.out 2> /tmp/r4logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r4logs/queue10.log
}

run train_resume2 -m reface_tpu.cli.train --dataset-dir /tmp/celeba512 \
  --logdir /tmp/trainrun --batch-size 1 --steps 60 --train-count 24 \
  --full-losses --split-grad 2 --mu-dtype bfloat16 \
  --split-acc-dtype bfloat16 --base-lr 1e-4 --warmup-steps 10 \
  --log-every 2 --ckpt-every 1000 --image-log-every 1000000 --epochs 1000 \
  --resume /tmp/trainrun/checkpoints/last
echo "QUEUE11 DONE $(date +%H:%M:%S)" >> /tmp/r4logs/queue10.log
