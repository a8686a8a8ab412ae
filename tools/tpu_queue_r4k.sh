#!/bin/bash
# Measure the all-heads batched SAB layout, and re-measure streaming on
# the block-fusion default.
set -u
cd /root/repo
LOG=/tmp/tpu_r4k.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "sab batched" BENCH_REPS=8 TCDIFF_SAB_BATCHED=1
run "default ctrl" BENCH_REPS=8
run "stream e2e (new default)" BENCH_MODE=stream_e2e
run "stream slice (new default)" BENCH_MODE=stream
echo "QUEUE-R4K DONE" >> "$LOG"
