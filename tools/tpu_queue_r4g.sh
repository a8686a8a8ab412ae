#!/bin/bash
# Measure the cross-attention block kernel on top of the new default
# (SAB+FFB auto-on). Waits for r4f.
set -u
cd /root/repo
LOG=/tmp/tpu_r4g.log
: > "$LOG"
while ! grep -q "QUEUE-R4F DONE" /tmp/tpu_r4f.log 2>/dev/null; do sleep 30; done

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "default+xab" BENCH_REPS=8 TCDIFF_PALLAS_XAB=1
run "default ctrl" BENCH_REPS=8
echo "QUEUE-R4G DONE" >> "$LOG"
