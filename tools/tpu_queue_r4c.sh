#!/bin/bash
# Block-fusion kernel sweep: whole self-attention block (SAB), whole FF
# block (FFB), and stacked combinations. Waits for the r4b A/B.
# NOTE: keep the host CPU idle while this runs (1-core host, ~15%
# distortion measured from a concurrent pytest).
set -u
cd /root/repo
LOG=/tmp/tpu_r4c.log
: > "$LOG"
while ! grep -q "QUEUE-R4B DONE" /tmp/tpu_r4b.log 2>/dev/null; do sleep 30; done

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "sab" BENCH_REPS=8 TCDIFF_PALLAS_SAB=1
run "ffb" BENCH_REPS=8 TCDIFF_PALLAS_FFB=1
run "sab+ffb" BENCH_REPS=8 TCDIFF_PALLAS_SAB=1 TCDIFF_PALLAS_FFB=1
run "full stack" BENCH_REPS=8 TCDIFF_PALLAS_SAB=1 TCDIFF_PALLAS_FFB=1 TCDIFF_PALLAS_LNROT=1 TCDIFF_PALLAS_LNMM=1
run "default ctrl" BENCH_REPS=8
echo "QUEUE-R4C DONE" >> "$LOG"
