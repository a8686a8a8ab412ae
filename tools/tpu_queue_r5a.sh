#!/bin/bash
# Round-3 TPU measurement queue A: training-step efficiency (VERDICT r2 #2)
# and the robust headline rerun (#8). SEQUENTIAL — one TPU process at a
# time (CLAUDE.md); generous per-job timeouts (cold axon compiles 10-15 min).
set -u
cd /root/repo
LOG=/tmp/tpu_r5a.log
: > "$LOG"
echo "=== queue-r5a start $(date +%H:%M:%S)" >> "$LOG"

run() {
  local name="$1"; local cmd="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python "$cmd" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

# 1. train-step MFU + profile: the round-2 default train config (batch 64
#    bf16) now reports MFU; capture an xplane trace for the attack plan.
run "train b64 bf16 profiled" bench.py BENCH_MODE=train BENCH_BATCH=64 \
    BENCH_DTYPE=bf16 BENCH_REPS=10 BENCH_PROFILE_DIR=/tmp/xplane_train_b64
# 2. reference-parity train config (batch 37 f32) for the anchor ratio.
run "train b37 f32" bench.py BENCH_MODE=train BENCH_BATCH=37 BENCH_REPS=10
# 3. remat cost on the same config (now safe with kv-cache fix).
run "train b64 bf16 remat" bench.py BENCH_MODE=train BENCH_BATCH=64 \
    BENCH_DTYPE=bf16 BENCH_REPS=10 BENCH_REMAT=1
# 4. robust headline: final default config, 8 reps (session 1 of >=3).
run "default sample reps8 s1" bench.py BENCH_REPS=8

echo "QUEUE-R5A DONE" >> "$LOG"
