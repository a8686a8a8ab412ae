#!/bin/bash
# Round-5 wave 5: CONFIRMATION of the shipped defaults on the real bench
# surface — what a user gets with zero env vars after the r5d decision
# flips (SAVE_RESID default-ON on TPU, BENCH_SCAN_STEPS default 10), plus
# the r3/r4-continuity arm, the b128 throughput shape, and a final
# headline reps-8 session (the sampler is untouched by the train flips,
# but the repo convention is to re-measure after any default change).
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r5e_campaign.jsonl}
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
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5e_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5e_${name// /_}_retry.log"
}

run "train defaults scan10" bench.py BENCH_MODE=train
run "train continuity perstep" bench.py BENCH_MODE=train BENCH_SCAN_STEPS=1
run "train b128 defaults" bench.py BENCH_MODE=train BENCH_BATCH=128
run "headline reps8 final" bench.py BENCH_REPS=8

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
