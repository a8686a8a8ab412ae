#!/bin/bash
# A/B the CFG-prefix dedup (exact math, default ON). Waits for r4r.
set -u
cd /root/repo
LOG=/tmp/tpu_r4s.log
: > "$LOG"
while ! grep -q "QUEUE-R4R DONE" /tmp/tpu_r4r.log 2>/dev/null; do sleep 30; done

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "cfg dedup on (new default)" BENCH_REPS=8
run "cfg dedup off" BENCH_REPS=8 TCDIFF_CFG_DEDUP=0
run "cfg dedup on #2" BENCH_REPS=8
echo "QUEUE-R4S DONE" >> "$LOG"
