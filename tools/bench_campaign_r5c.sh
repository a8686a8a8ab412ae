#!/bin/bash
# Round-5 wave 3 (re-run of the b64 SAVE_RESID A/B after the o-only
# pivot — wave 2's b64 arm ran the four-save variant and OOM'd):
# Original wave-2 header follows.
# the SAVE_RESID train A/B (forward writes q/k/v/o
# residuals; backward skips the K1/K2 recompute programs in both
# attention blocks — ~1.8 ms/layer of pure recompute vs ~0.3 ms/layer of
# extra HBM traffic at batch 64), plus a paired control in the same
# session. Fire AFTER tools/bench_campaign_r5.sh completes.
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r5c_campaign.jsonl}
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
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5c_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5c_${name// /_}_retry.log"
}

# paired in ONE process (tools/ab_train.py): the no-env-vars config spread
# 5.47-6.08 steps/s across four separate r5 sessions, so the decision A/B
# must share a session; A,B,A bracketing guards drift.
run "ab save_resid b64" "tools/ab_train.py control= save=TCDIFF_TRAIN_SAVE_RESID=1 control2="
run "ab save_resid b128" "tools/ab_train.py control= save=TCDIFF_TRAIN_SAVE_RESID=1" BENCH_BATCH=128
# per-leaf EMA vs the flat lerp (its ravel-concats are ~3.8 ms of the
# 113.7 ms kernel-stack step — r5 SAVE_RESID profile), plus the stacked
# candidate default (SAVE_RESID + per-leaf EMA) in the same session
run "ab flat_ema b64" "tools/ab_train.py control= perleaf=TCDIFF_FLAT_EMA=0 both=TCDIFF_FLAT_EMA=0,TCDIFF_TRAIN_SAVE_RESID=1"

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
