#!/bin/bash
# DBN-only training dynamics (the combined run's DBN stage hit the job
# timeout before its first print at iter 200 under CPU contention).
set -u
cd /root/repo
LOG=/tmp/tpu_r3g.log
: > "$LOG"
while ! grep -q "QUEUE-R3F DONE" /tmp/tpu_r3f.log 2>/dev/null; do sleep 30; done
echo "=== dbn dynamics ($(date +%H:%M:%S))" >> "$LOG"
env DYN_SKIP_DENOISER=1 DYN_DBN_ITERS=1000 DYN_DBN_PRINT=50 DYN_LOG=/tmp/dbn_dynamics.jsonl \
  timeout 5400 python tools/train_dynamics.py >> "$LOG" 2>&1
echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
echo "QUEUE-R3G DONE" >> "$LOG"
