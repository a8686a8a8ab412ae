#!/bin/bash
# Measure the fixed LNMM kernel (32-row-aligned blocks) and the new
# LNROT kernel (LN->rotary->QKV fusion), alone and combined.
set -u
cd /root/repo
LOG=/tmp/tpu_r3f.log
: > "$LOG"
while ! grep -q "QUEUE-R3E DONE" /tmp/tpu_r3e.log 2>/dev/null; do sleep 30; done

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "lnmm fixed" BENCH_REPS=5 TCDIFF_PALLAS_LNMM=1
run "lnrot" BENCH_REPS=5 TCDIFF_PALLAS_LNROT=1
run "lnmm+lnrot" BENCH_REPS=5 TCDIFF_PALLAS_LNMM=1 TCDIFF_PALLAS_LNROT=1
echo "QUEUE-R3F DONE" >> "$LOG"
