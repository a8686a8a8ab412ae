#!/bin/bash
# Round-3 TPU measurement queue B: remat-train rerun (r5a crashed on a
# mid-edit kernel file), SAB layout A/Bs (VERDICT r2 #4), robust-headline
# session 2 (#8). SEQUENTIAL — one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
LOG=/tmp/tpu_r5b.log
: > "$LOG"
echo "=== queue-r5b start $(date +%H:%M:%S)" >> "$LOG"

run() {
  local name="$1"; local cmd="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout 2700 python "$cmd" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}

# 1. remat train cost (rerun; kernel file now consistent)
run "train b64 bf16 remat" bench.py BENCH_MODE=train BENCH_BATCH=64 \
    BENCH_DTYPE=bf16 BENCH_REPS=10 BENCH_REMAT=1
# 2. SAB batched2 layout A/B on the default sampler config
run "sample sab_batched2" bench.py BENCH_REPS=6 TCDIFF_SAB_BATCHED2=1
# 3. exp2 softmax A/B (default sliced layout)
run "sample sab_exp2" bench.py BENCH_REPS=6 TCDIFF_SAB_EXP2=1
# 4. robust headline session 2 (paired with the A/Bs above, same session)
run "default sample reps8 s2" bench.py BENCH_REPS=8

echo "QUEUE-R5B DONE" >> "$LOG"
