#!/bin/bash
# Confirm the new default (SAB+FFB auto-on on TPU, no env needed) and
# measure the opt-in speed ladder on top of it.
set -u
cd /root/repo
LOG=/tmp/tpu_r4f.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "new default (no env)" BENCH_REPS=8
run "forecast2 on new default" BENCH_REPS=8 BENCH_FORECAST=2
run "forecast3 on new default" BENCH_REPS=8 BENCH_FORECAST=3
run "old xla path (flags off)" BENCH_REPS=8 TCDIFF_PALLAS_SAB=0 TCDIFF_PALLAS_FFB=0
echo "QUEUE-R4F DONE" >> "$LOG"
