#!/bin/bash
# Round-5 measurement campaign: confirm the shipped defaults (VERDICT r4
# #1/#6/#7) and gather the train-MFU attack evidence (#4).
#   * train defaults    — BENCH_MODE=train with NO kernel/opt env vars:
#                         the r4c decision (ALL3 + per-leaf Adan, 6.114
#                         steps/s) must now be what a user gets.
#   * headline defaults — sampler at the new batch-16 default, reps 8.
#   * headline b8       — continuity arm (batch-8 181-band history).
#   * aot combos        — FULL-train-step compile of all 2^3 train-kernel
#                         flag combos (the SAB+XAB OOM fix gate).
#   * train profiled    — xplane capture of the default train step for the
#                         19.3% -> 30% MFU attack (VERDICT r4 #4).
#   * train b128        — fixed-cost amortization A/B.
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r5_campaign.jsonl}
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
  name=$1; prog=$2; shift 2
  yield_chip
  echo "### $name ($(date -u +%H:%M:%S))" >> "$out"
  # $prog is intentionally word-split ("tools/aot_checks.py combos")
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5_${name// /_}_retry.log"
}

run "train defaults" bench.py BENCH_MODE=train
run "train defaults syncstep" bench.py BENCH_MODE=train BENCH_SYNC_EVERY=1
run "headline defaults reps8" bench.py BENCH_REPS=8
run "aot combos" "tools/aot_checks.py combos"
run "train profiled" bench.py BENCH_MODE=train BENCH_PROFILE_DIR=/tmp/prof_r5_train
run "train b128" bench.py BENCH_MODE=train BENCH_BATCH=128
run "headline b8" bench.py BENCH_REPS=6 BENCH_BATCH=8

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
