#!/bin/bash
# Round-5 chip queue #7 — video pipeline re-measure on the one-XLA-program
# batch step (pipelines/raw.py::_video_batch_program, commit ff89999).
# Queue-1's --bench-ram row measured the EAGER robust path: ~20 dispatch
# round trips per frame batch over the axon tunnel -> 0.576 fps with the
# chip ladder at 2.13. The one-program path is one dispatch per batch;
# this queue measures (a) the RAM-bypass ceiling and (b) true end-to-end
# (decode + x264) on the same 720p 110-frame clip, same source, plus the
# exact-ERT conditioning variant of (a). Waits for queue6 (EMA) so the
# timed windows are uncontended.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5logs

for i in $(seq 1440); do
  grep -q "QUEUE6 DONE" /tmp/r5logs/queue6.log 2>/dev/null && break
  sleep 20
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" >> /tmp/r5logs/queue7.log
  timeout 7200 python "$@" > /tmp/r5logs/$name.out 2> /tmp/r5logs/$name.err
  echo "$name rc=$? ($(date +%H:%M:%S))" >> /tmp/r5logs/queue7.log
  sleep 45
}

run video_ram_onep  -m reface_tpu.cli.video_swap --video /tmp/clip720.mp4 \
                    --source /tmp/celeba_bench/CelebA-HQ-img/29000.jpg \
                    --outdir /tmp/r5_vram2 --frame-batch 10 --frames 110 \
                    --bench-ram
run video_e2e_onep  -m reface_tpu.cli.video_swap --video /tmp/clip720.mp4 \
                    --source /tmp/celeba_bench/CelebA-HQ-img/29000.jpg \
                    --outdir /tmp/r5_ve2e --frame-batch 10 --frames 110 \
                    --bench-json
run video_ram_ert   -m reface_tpu.cli.video_swap --video /tmp/clip720.mp4 \
                    --source /tmp/celeba_bench/CelebA-HQ-img/29000.jpg \
                    --outdir /tmp/r5_vram3 --frame-batch 10 --frames 110 \
                    --bench-ram --landmark-rert /tmp/lm68.rert
echo "QUEUE7 DONE $(date +%H:%M:%S)" >> /tmp/r5logs/queue7.log
