#!/bin/bash
# FF-block arms with the inlined XLA erf polynomial (Mosaic lowers neither
# erf nor erfc). Waits for r4d.
set -u
cd /root/repo
LOG=/tmp/tpu_r4e.log
: > "$LOG"
while ! grep -q "QUEUE-R4D DONE" /tmp/tpu_r4d.log 2>/dev/null; do sleep 30; done

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "ffb (poly erf)" BENCH_REPS=8 TCDIFF_PALLAS_FFB=1
run "sab+ffb" BENCH_REPS=8 TCDIFF_PALLAS_SAB=1 TCDIFF_PALLAS_FFB=1
run "full stack" BENCH_REPS=8 TCDIFF_PALLAS_SAB=1 TCDIFF_PALLAS_FFB=1 TCDIFF_PALLAS_LNROT=1 TCDIFF_PALLAS_LNMM=1
echo "QUEUE-R4E DONE" >> "$LOG"
