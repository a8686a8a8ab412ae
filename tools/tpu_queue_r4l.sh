#!/bin/bash
# A/B the hoisted cross-attention k/v cache (exact math, default ON).
set -u
cd /root/repo
LOG=/tmp/tpu_r4l.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "kv-cache on (new default)" BENCH_REPS=8
run "kv-cache off" BENCH_REPS=8 TCDIFF_KV_CACHE=0
run "kv-cache on #2" BENCH_REPS=8
echo "QUEUE-R4L DONE" >> "$LOG"
