#!/bin/bash
# Round-2 continuation: measure the fixed LNROT kernel (bf16 rotate fix)
# and the new int8 serving path. Waits for the DBN dynamics run (r3g).
set -u
cd /root/repo
LOG=/tmp/tpu_r4a.log
: > "$LOG"
while ! grep -q "QUEUE-R3G DONE" /tmp/tpu_r3g.log 2>/dev/null; do sleep 30; done

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "lnrot (bf16-rotate fix)" BENCH_REPS=5 TCDIFF_PALLAS_LNROT=1
run "int8" BENCH_REPS=5 TCDIFF_INT8=1
run "int8+forecast2" BENCH_REPS=5 TCDIFF_INT8=1 BENCH_FORECAST=2
echo "QUEUE-R4A DONE" >> "$LOG"
