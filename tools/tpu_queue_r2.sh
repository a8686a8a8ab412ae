#!/bin/bash
# Round-2 TPU job queue: waits for the first sweep, then runs follow-ups
# SEQUENTIALLY (one TPU process at a time — CLAUDE.md).
set -u
cd /root/repo
LOG=/tmp/tpu_queue_r2.log
: > "$LOG"

# wait for sweep 1
while ! grep -q "SWEEP DONE" /tmp/bench_r2.log 2>/dev/null; do sleep 30; done
echo "=== queue start $(date +%H:%M:%S)" >> "$LOG"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" python "$CMD" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

# final-number candidates on the exact-math default (roll+fusion einsum)
CMD=bench.py
run "final roll+fusion reps8" BENCH_REPS=8 TCDIFF_FUSION=einsum
run "roll+fusion unroll2" BENCH_REPS=5 TCDIFF_FUSION=einsum BENCH_UNROLL=2
run "roll+fusion batch16" BENCH_REPS=5 TCDIFF_FUSION=einsum BENCH_BATCH=16

# training dynamics on the real chip (VERDICT item 5)
CMD=tools/train_dynamics.py
run "train dynamics" DYN_STEPS=400 DYN_BATCH=32

# streaming e2e TTFM (VERDICT item 8 measurement)
CMD=bench.py
run "stream e2e 60s song" BENCH_MODE=stream_e2e TCDIFF_FUSION=einsum

echo "QUEUE DONE" >> "$LOG"
