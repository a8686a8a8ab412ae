#!/bin/bash
# Final streaming numbers with every round-2 default (kernels + hoists + dedup).
set -u
cd /root/repo
LOG=/tmp/tpu_r4t.log
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 1500 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "stream e2e final" BENCH_MODE=stream_e2e
run "stream slice final" BENCH_MODE=stream
echo "QUEUE-R4T DONE" >> "$LOG"
