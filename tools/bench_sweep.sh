#!/bin/bash
# Sequential TPU bench sweep over the layout variants (ONE TPU process at a
# time; cold axon compiles are 10-15 min each — see CLAUDE.md).
set -u
cd /root/repo
LOG=${1:-/tmp/bench_r2.log}
: > "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

run "roll-rotary (new default)" BENCH_REPS=5
run "roll+fusion-einsum" BENCH_REPS=5 TCDIFF_FUSION=einsum
run "roll+ln-bf16" BENCH_REPS=5 TCDIFF_LN_BF16=1
run "all-three" BENCH_REPS=5 TCDIFF_FUSION=einsum TCDIFF_LN_BF16=1
echo "SWEEP DONE" >> "$LOG"
