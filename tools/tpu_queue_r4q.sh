#!/bin/bash
# Measure the weight-split SAB head layout.
set -u
cd /root/repo
LOG=/tmp/tpu_r4q.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "sab wsplit" BENCH_REPS=8 TCDIFF_SAB_WSPLIT=1
run "default ctrl" BENCH_REPS=8
echo "QUEUE-R4Q DONE" >> "$LOG"
