#!/bin/bash
# Round-2 (session 2) TPU measurement queue. The previous session's /tmp
# queue logs were lost with the container reset, so these runs re-collect
# the pending measurements. SEQUENTIAL — one TPU process at a time
# (CLAUDE.md); generous per-job timeout (cold axon compiles are 10-15 min).
set -u
cd /root/repo
LOG=/tmp/tpu_r3.log
: > "$LOG"
echo "=== queue-r3 start $(date +%H:%M:%S)" >> "$LOG"

run() {
  local name="$1"; local cmd="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python "$cmd" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

# 1. headline: rotary-roll + einsum-fusion defaults (expected ~134)
run "default bench reps5" bench.py BENCH_REPS=5
# 2. training dynamics on the real chip (VERDICT item 5)
run "train dynamics" tools/train_dynamics.py DYN_STEPS=400 DYN_BATCH=32
# 3. streaming e2e TTFM, pipelined vs up-front (VERDICT item 8)
run "stream e2e 60s" bench.py BENCH_MODE=stream_e2e
# 4. LMS forecast sampler (skip model forwards)
run "forecast k=2" bench.py BENCH_REPS=5 BENCH_FORECAST=2
# 5. fused LN->matmul Pallas kernel
run "lnmm fused" bench.py BENCH_REPS=5 TCDIFF_PALLAS_LNMM=1
# 6. forecast k=3
run "forecast k=3" bench.py BENCH_REPS=5 BENCH_FORECAST=3

echo "QUEUE-R3 DONE" >> "$LOG"
