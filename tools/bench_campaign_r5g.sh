#!/bin/bash
# Round-5 wave 7: the sampler batch BRACKET, paired in one process.
# The headline curve so far is cross-process: b8 181, b16 191.2-196.9,
# b32 187.4 — the peak sits between 16 and 32 and the session spread
# (±3%) swamps any cross-process read of b20/b24. tools/ab_sample.py
# measures all points in ONE process (A,B,C,A order brackets drift).
# If a point beats b16 reproducibly, bench.py's BENCH_BATCH default
# flips and a reps-8 confirm arm re-measures the headline at it.
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r5g_campaign.jsonl}
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
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5g_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5g_${name// /_}_retry.log"
}

run "sampler bracket b16 b20 b24 b16" \
  "tools/ab_sample.py b16=BENCH_BATCH=16 b20=BENCH_BATCH=20 b24=BENCH_BATCH=24 b16rep=BENCH_BATCH=16" \
  BENCH_REPS=5

run "headline defaults reps8" bench.py BENCH_REPS=8

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
