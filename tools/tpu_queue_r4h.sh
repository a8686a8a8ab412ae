#!/bin/bash
# Measure in-kernel residual+FiLM fusion, alone and with XAB. Waits for r4g.
set -u
cd /root/repo
LOG=/tmp/tpu_r4h.log
: > "$LOG"
while ! grep -q "QUEUE-R4G DONE" /tmp/tpu_r4g.log 2>/dev/null; do sleep 30; done

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "default+film" BENCH_REPS=8 TCDIFF_FUSE_FILM=1
run "default+xab+film" BENCH_REPS=8 TCDIFF_PALLAS_XAB=1 TCDIFF_FUSE_FILM=1
echo "QUEUE-R4H DONE" >> "$LOG"
