#!/bin/bash
# Round-5 wave 4: (a) CLEAN re-bracket of the SAVE_RESID b64 paired A/B —
# the r5c bracket's control2 window was contaminated by concurrent
# CPU-side pytest runs on this 1-core host (the documented ~15%
# distortion, BENCH_NOTES r2) — and (b) the BENCH_SCAN_STEPS lever:
# N train steps per dispatch via lax.scan, measuring device-bound
# throughput without the per-step axon-tunnel dispatch latency
# (~40 ms/step of host RPC that a production host with a local chip
# does not pay; the r5 profile showed 123 ms device vs 164 ms wall).
# HOST MUST BE IDLE for the whole campaign.
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r5d_campaign.jsonl}
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
    timeout 7200 python $prog >> "$out" 2>"/tmp/err_r5d_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 7200 python $prog >> "$out" 2>"/tmp/err_r5d_${name// /_}_retry.log"
}

# ONE process, A,B,A,B bracket + the scan pairing: the r5c flat_ema arm
# showed even in-process configs drift with ORDER (control 6.064 /
# perleaf 5.046 / both 6.719 — the 'both' number is inconsistent with
# save-alone's +0.7%), so the decision needs alternation; the scan10
# configs time 100 steps per sync and are the least host-sensitive.
run "ab decision b64" "tools/ab_train.py control= save=TCDIFF_TRAIN_SAVE_RESID=1 control2= save2=TCDIFF_TRAIN_SAVE_RESID=1 scan10=BENCH_SCAN_STEPS=10 scan10_save=BENCH_SCAN_STEPS=10,TCDIFF_TRAIN_SAVE_RESID=1"

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
