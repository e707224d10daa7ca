#!/bin/bash
# Round-5 queue #8 — host-side validation AFTER the chip campaign:
# the full CPU test suite (~35 min on this 1-core container) and the
# 8-device virtual-mesh dryrun would contaminate the timed chip windows
# in queues 2-7 if run concurrently, so they chain behind QUEUE7 DONE.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5logs

for i in $(seq 1440); do
  grep -q "QUEUE7 DONE" /tmp/r5logs/queue7.log 2>/dev/null && break
  sleep 20
done

echo "=== pytest_full ($(date +%H:%M:%S)) ===" >> /tmp/r5logs/queue8.log
timeout 5400 python -m pytest tests/ -q \
    > /tmp/r5logs/pytest_full_r5.log 2>&1
echo "pytest rc=$? ($(date +%H:%M:%S))" >> /tmp/r5logs/queue8.log

echo "=== multichip dryrun ($(date +%H:%M:%S)) ===" >> /tmp/r5logs/queue8.log
timeout 3600 python __graft_entry__.py multichip 8 \
    > /tmp/r5logs/multichip_r5.log 2>&1
echo "multichip rc=$? ($(date +%H:%M:%S))" >> /tmp/r5logs/queue8.log
echo "QUEUE8 DONE $(date +%H:%M:%S)" >> /tmp/r5logs/queue8.log
