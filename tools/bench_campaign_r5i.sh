#!/bin/bash
# Round-5 wave 8b: TCDIFF_FK_ANCMAT with the pointer-jumping world-rotation
# walk (skeleton.py _JUMP). Wave 8a measured the position-matmul half alone
# NEUTRAL (b64 8.366/8.394 vs ctl 8.393/8.404; b192 571.4 vs 570.8) —
# consistent with the r5 profile, which puts the FK cost in the ROTATION
# half (quaternion gathers ~2.5 ms + two f32[64,450,24,4] layout copies
# ~0.9 ms of the 113.7 ms step). The jump walk replaces the 8-level
# stack/scatter with 4 batched quat_multiply's on constant gather tables.
# b192 arm: +1.5% there crosses the 30% MFU milestone (571 = 29.6%).
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r5i_campaign.jsonl}
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
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5i_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5i_${name// /_}_retry.log"
}

# A,B,A,B at the zero-env-vars train config (kernels + SAVE_RESID + scan 10)
run "fk jump b64 scan10" \
  "tools/ab_train.py ctl=TCDIFF_FK_ANCMAT=0 fk=TCDIFF_FK_ANCMAT=1 ctl2=TCDIFF_FK_ANCMAT=0 fk2=TCDIFF_FK_ANCMAT=1" \
  BENCH_SCAN_STEPS=10 BENCH_REPS=10

# the 30%-MFU milestone arm
run "fk jump b192 scan10" \
  "tools/ab_train.py ctl=TCDIFF_FK_ANCMAT=0 fk=TCDIFF_FK_ANCMAT=1" \
  BENCH_SCAN_STEPS=10 BENCH_REPS=5 BENCH_BATCH=192

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
