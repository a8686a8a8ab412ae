#!/bin/bash
# Round-5 wave 8: the FK ancestor-matrix lever (TCDIFF_FK_ANCMAT), paired.
# The r5 profiles put the FK-loss chain at ~3.4 ms of the 113.7 ms step
# (quaternion gathers 2.5 ms + two f32[64,450,24,4] layout copies); the
# ancmat path replaces the per-level position accumulation with one parent
# gather + one batched quat_apply + a (23,23) constant matmul, and the loss
# consumes root-RELATIVE positions directly (the reference subtracts the
# root anyway), skipping the absolute assembly and the target's root add.
# Expected ~1.5-2.5% — resolvable only in ONE process (tools/ab_train.py,
# within-config spread ~0.5% per wave 4). b192 arm: +1.5% there crosses the
# 30% MFU milestone (571 samples/s = 29.6% today).
# Lock/yield protocol identical to tools/bench_campaign_r4.sh.
set -u
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r5h_campaign.jsonl}
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
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5h_${name// /_}.log" && return
  sleep 120
  echo "### $name (retry $(date -u +%H:%M:%S))" >> "$out"
  env BENCH_INIT_TIMEOUT=300 BENCH_INIT_RETRIES=1 BENCH_INIT_BACKOFF=60 \
    TCDIFF_BENCH_LOCK_OWNER=1 "$@" \
    timeout 5400 python $prog >> "$out" 2>"/tmp/err_r5h_${name// /_}_retry.log"
}

# A,B,A,B at the zero-env-vars train config (kernels + SAVE_RESID + scan 10)
run "fk ancmat b64 scan10" \
  "tools/ab_train.py ctl=TCDIFF_FK_ANCMAT=0 fk=TCDIFF_FK_ANCMAT=1 ctl2=TCDIFF_FK_ANCMAT=0 fk2=TCDIFF_FK_ANCMAT=1" \
  BENCH_SCAN_STEPS=10 BENCH_REPS=10

# the 30%-MFU milestone arm: b192 is the measured samples/s plateau
run "fk ancmat b192 scan10" \
  "tools/ab_train.py ctl=TCDIFF_FK_ANCMAT=0 fk=TCDIFF_FK_ANCMAT=1" \
  BENCH_SCAN_STEPS=10 BENCH_REPS=5 BENCH_BATCH=192

# scoped-VMEM gate before any default flip: the FK chain is XLA context
# AROUND the train kernels (house rule: module-dependent VMEM demand) —
# all 2^3 kernel combos must compile with ANCMAT on
run "aot combos ancmat" "tools/aot_checks.py combos" TCDIFF_FK_ANCMAT=1

echo "### DONE ($(date -u +%H:%M:%S))" >> "$out"
