#!/bin/bash
# Round-4 third wave: decide the remaining train-step defaults now that the
# kernel stack measured +88% (.bench_r4b_campaign.jsonl TRAIN_ALL3 5.82
# steps/s vs 3.09-3.11 controls).
#   * FLAT_OPT A/B under the kernel stack — the r4 train-stack profile
#     (fixed parser) shows the flat Adan path's concats + update at ~11 ms
#     of the 131 ms device step (~8%); the flat form won when the XLA step
#     was 3x slower, so re-decide at the new balance.
#   * clean solo-FFB re-measure (the 09:22 arm overlapped a CPU-heavy
#     verify run on this 1-core host; see BENCH_NOTES r4).
#   * FFB row-block size bracket: default lblk<=160 picks 150 at L=450
#     (~7 MB stack); 225 (~11 MB, still under the 16 MB limit) halves the
#     grad-accumulator revisits.
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r4c_campaign.jsonl}
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
    timeout 3600 python bench.py >> "$out" 2>"/tmp/err_r4c_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 3600 python bench.py >> "$out" 2>"/tmp/err_r4c_${name// /_}_retry.log"
}

run "ALL3 FLAT_OPT0" TCDIFF_TRAIN_SAB=1 TCDIFF_TRAIN_XAB=1 TCDIFF_TRAIN_FFB=1 TCDIFF_FLAT_OPT=0 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16
run "TRAIN_FFB clean" TCDIFF_TRAIN_FFB=1 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16
run "ALL3 LBLK225" TCDIFF_TRAIN_SAB=1 TCDIFF_TRAIN_XAB=1 TCDIFF_TRAIN_FFB=1 TCDIFF_FFB_LBLK=225 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16
run "ALL3 repeat" TCDIFF_TRAIN_SAB=1 TCDIFF_TRAIN_XAB=1 TCDIFF_TRAIN_FFB=1 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
