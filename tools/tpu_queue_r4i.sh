#!/bin/bash
# Film-fusion retry with (b,1,d) FiLM blocks (Mosaic block-shape rule).
set -u
cd /root/repo
LOG=/tmp/tpu_r4i.log
: > "$LOG"
while ! grep -q "QUEUE-R4H DONE" /tmp/tpu_r4h.log 2>/dev/null; do sleep 30; done

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "default+film" BENCH_REPS=8 TCDIFF_FUSE_FILM=1
run "default ctrl" BENCH_REPS=8
echo "QUEUE-R4I DONE" >> "$LOG"
