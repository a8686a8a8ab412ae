#!/bin/bash
# Second round-2 TPU queue: waits for tpu_queue_r2.sh, then measures the
# forecast accelerator. One TPU process at a time.
set -u
cd /root/repo
LOG=/tmp/tpu_queue_r2b.log
: > "$LOG"
while ! grep -q "QUEUE DONE" /tmp/tpu_queue_r2.log 2>/dev/null; do sleep 30; done
echo "=== queue-b start $(date +%H:%M:%S)" >> "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "forecast k=2" BENCH_REPS=5 BENCH_FORECAST=2
run "forecast k=3" BENCH_REPS=5 BENCH_FORECAST=3
echo "QUEUE-B DONE" >> "$LOG"
