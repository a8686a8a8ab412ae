#!/bin/bash
# Round-5 wave 6: the batch ladder — b128 scan10 measured MFU 29.5%;
# larger batches amortize per-step fixed work further and may cross the
# 30% train-MFU milestone (VERDICT r4 #4 asked for 19.3% -> 30%+).
# b256/b384 are memory probes as much as perf arms: the train kernels'
# per-(b,head) grid keeps VMEM flat, but HBM holds the saved o-residuals
# (118 MB/layer at b256).
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r5f_campaign.jsonl}
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
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5f_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5f_${name// /_}_retry.log"
}

run "train b192 scan10" bench.py BENCH_MODE=train BENCH_BATCH=192
run "train b256 scan10" bench.py BENCH_MODE=train BENCH_BATCH=256

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
