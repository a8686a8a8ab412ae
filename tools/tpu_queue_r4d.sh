#!/bin/bash
# Retry the FF-block arms with the erf-form GELU (Mosaic has no erfc
# lowering), plus a SAB confirmation rep.
set -u
cd /root/repo
LOG=/tmp/tpu_r4d.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "ffb (erf fix)" BENCH_REPS=8 TCDIFF_PALLAS_FFB=1
run "sab+ffb" BENCH_REPS=8 TCDIFF_PALLAS_SAB=1 TCDIFF_PALLAS_FFB=1
run "full stack" BENCH_REPS=8 TCDIFF_PALLAS_SAB=1 TCDIFF_PALLAS_FFB=1 TCDIFF_PALLAS_LNROT=1 TCDIFF_PALLAS_LNMM=1
run "sab confirm" BENCH_REPS=8 TCDIFF_PALLAS_SAB=1
echo "QUEUE-R4D DONE" >> "$LOG"
