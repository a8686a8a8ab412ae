#!/bin/bash
# Round-4 follow-up arms: the two train arms that failed in the main
# campaign (.bench_r4_campaign.jsonl 03:42-04:26) because the FFB
# backward's single-program stack measured 21.71 MB vs the 16 MB
# scoped-VMEM limit at L=450 — re-measured with the row-blocked backward
# (ops/fused_ff_block_train.py grid (b, L//lblk)) — plus the SAB+XAB duo
# (the fallback default if FFB still loses) and a fresh paired control.
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r4b_campaign.jsonl}
: > "$out"
busy=${TPU_BUSY_LOCK:-/tmp/tpu_busy}
wanted=${TPU_WANTED_MARK:-/tmp/tpu_wanted}
touch "$busy"
trap 'rm -f "$busy"' EXIT

wanted_fresh() {
  [ -e "$wanted" ] && [ -z "$(find "$wanted" -mmin +120 2>/dev/null)" ]
}
yield_chip() {
  if wanted_fresh; then
    echo "### yielding chip to driver bench ($(date -u +%H:%M:%S))" >> "$out"
    rm -f "$busy"
    while wanted_fresh; do sleep "${YIELD_POLL_S:-60}"; done
    touch "$busy"
    echo "### chip reclaimed ($(date -u +%H:%M:%S))" >> "$out"
  fi
}

run() {
  name=$1; shift
  yield_chip
  echo "### $name ($(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 3600 python bench.py >> "$out" 2>"/tmp/err_r4b_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 3600 python bench.py >> "$out" 2>"/tmp/err_r4b_${name// /_}_retry.log"
}

run "TRAIN_FFB rowblk" TCDIFF_TRAIN_FFB=1 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16
run "TRAIN_ALL3 rowblk" TCDIFF_TRAIN_SAB=1 TCDIFF_TRAIN_XAB=1 TCDIFF_TRAIN_FFB=1 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16 BENCH_PROFILE_DIR=/tmp/prof_r4_train_stack
run "TRAIN_SAB_XAB" TCDIFF_TRAIN_SAB=1 TCDIFF_TRAIN_XAB=1 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16
run "train control C" BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16

# --- headline batch sweep tail: does batch 32 amortize further past
# b16's 191.2?  One arm + its control, cheap relative to the decision. ---
run "headline b32" BENCH_BATCH=32 BENCH_REPS=6
run "headline b16 repeat" BENCH_BATCH=16 BENCH_REPS=6

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
