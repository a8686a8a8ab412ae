#!/bin/bash
# Round-5 wave 2: the SAVE_RESID train A/B (forward writes q/k/v/o
# residuals; backward skips the K1/K2 recompute programs in both
# attention blocks — ~1.8 ms/layer of pure recompute vs ~0.3 ms/layer of
# extra HBM traffic at batch 64), plus a paired control in the same
# session. Fire AFTER tools/bench_campaign_r5.sh completes.
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r5b_campaign.jsonl}
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
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5b_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5b_${name// /_}_retry.log"
}

run "train SAVE_RESID" bench.py BENCH_MODE=train TCDIFF_TRAIN_SAVE_RESID=1
run "train control" bench.py BENCH_MODE=train
run "train SAVE_RESID b128" bench.py BENCH_MODE=train BENCH_BATCH=128 TCDIFF_TRAIN_SAVE_RESID=1
run "train SAB_LBLK225" bench.py BENCH_MODE=train TCDIFF_SAB_LBLK=225
run "train SAVE_RESID profiled" bench.py BENCH_MODE=train TCDIFF_TRAIN_SAVE_RESID=1 BENCH_PROFILE_DIR=/tmp/prof_r5_save_resid

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
