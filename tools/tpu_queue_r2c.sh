#!/bin/bash
# Third round-2 TPU queue: fused LN->matmul measurement.
set -u
cd /root/repo
LOG=/tmp/tpu_queue_r2c.log
: > "$LOG"
while ! grep -q "QUEUE-B DONE" /tmp/tpu_queue_r2b.log 2>/dev/null; do sleep 30; done
echo "=== queue-c start $(date +%H:%M:%S)" >> "$LOG"
echo "=== lnmm fused (env TCDIFF_PALLAS_LNMM=1)" >> "$LOG"
env BENCH_REPS=5 TCDIFF_PALLAS_LNMM=1 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
echo "QUEUE-C DONE" >> "$LOG"
