#!/bin/bash
# Measure the FF-tail kernel extension on the current default. Waits r4l.
set -u
cd /root/repo
LOG=/tmp/tpu_r4m.log
: > "$LOG"
while ! grep -q "QUEUE-R4L DONE" /tmp/tpu_r4l.log 2>/dev/null; do sleep 30; done

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "fft (ff tail)" BENCH_REPS=8 TCDIFF_PALLAS_FFT=1
run "default ctrl" BENCH_REPS=8
echo "QUEUE-R4M DONE" >> "$LOG"
