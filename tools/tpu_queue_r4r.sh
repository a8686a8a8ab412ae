#!/bin/bash
# Clean wsplit A/B (r4q was contaminated by a concurrent smoke test) and
# the forecast-quality validation on trained weights.
set -u
cd /root/repo
LOG=/tmp/tpu_r4r.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "sab wsplit clean" BENCH_REPS=8 TCDIFF_SAB_WSPLIT=1
run "default ctrl clean" BENCH_REPS=8
echo "=== forecast-quality dynamics ($(date +%H:%M:%S))" >> "$LOG"
env DYN_FORECAST_EVAL=2,3 DYN_LOG=/tmp/dyn_fq.jsonl timeout 5400 python tools/train_dynamics.py >> "$LOG" 2>&1
echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
echo "QUEUE-R4R DONE" >> "$LOG"
