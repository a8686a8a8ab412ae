#!/bin/bash
# Second FF-tail A/B pair to decide the default.
set -u
cd /root/repo
LOG=/tmp/tpu_r4n.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "fft #2" BENCH_REPS=8 TCDIFF_PALLAS_FFT=1
run "default ctrl #2" BENCH_REPS=8
echo "QUEUE-R4N DONE" >> "$LOG"
