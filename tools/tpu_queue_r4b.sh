#!/bin/bash
# Paired A/B: default sampler vs the LNROT fused kernel, interleaved
# back-to-back so tunnel/host conditions are as equal as possible.
set -u
cd /root/repo
LOG=/tmp/tpu_r4b.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "A default #1" BENCH_REPS=8
run "B lnrot   #1" BENCH_REPS=8 TCDIFF_PALLAS_LNROT=1
run "A default #2" BENCH_REPS=8
run "B lnrot   #2" BENCH_REPS=8 TCDIFF_PALLAS_LNROT=1
echo "QUEUE-R4B DONE" >> "$LOG"
