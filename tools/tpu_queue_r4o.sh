#!/bin/bash
# Final default confirmation (SAB+FFB+FFT+kv-cache, no env) + forecast ladder.
set -u
cd /root/repo
LOG=/tmp/tpu_r4o.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "final default (no env)" BENCH_REPS=8
run "final default #2" BENCH_REPS=8
run "forecast2 final" BENCH_REPS=8 BENCH_FORECAST=2
run "forecast3 final" BENCH_REPS=8 BENCH_FORECAST=3
run "stream final" BENCH_MODE=stream
echo "QUEUE-R4O DONE" >> "$LOG"
