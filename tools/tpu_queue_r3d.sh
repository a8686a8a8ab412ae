#!/bin/bash
# Clean headline re-run: the first r3 headline measurement overlapped a
# CPU-side pytest run on this 1-core host and came in low (115.3). Re-run
# with the core otherwise idle.
set -u
cd /root/repo
LOG=/tmp/tpu_r3d.log
: > "$LOG"
while ! grep -q "QUEUE-R3 DONE" /tmp/tpu_r3.log 2>/dev/null; do sleep 30; done
echo "=== headline rerun ($(date +%H:%M:%S))" >> "$LOG"
env BENCH_REPS=8 timeout 2700 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
echo "QUEUE-R3D DONE" >> "$LOG"
