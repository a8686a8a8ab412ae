#!/bin/bash
# Round-3 campaign 3 (retry): train-kernel A/B + forecast seed sweep +
# headline reps. Each arm retries once after 90 s on failure (the axon
# backend threw transient UNAVAILABLE errors during the first attempt).
cd /root/repo
out=${BENCH_CAMPAIGN_OUT:-/root/repo/.bench_r3_campaign3.jsonl}
: > $out
run() {
  name=$1; shift
  echo "### $name" >> $out
  env "$@" timeout 2700 python bench.py >> $out 2>"/tmp/err_c3_${name// /_}.log" && return
  sleep 90
  echo "### $name (retry)" >> $out
  env "$@" timeout 2700 python bench.py >> $out 2>"/tmp/err_c3_${name// /_}_retry.log"
}

# --- A. training-kernel A/B (batch 64 bf16; paired controls) ---
run "train control A" BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16
run "TRAIN_SAB" TCDIFF_TRAIN_SAB=1 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16
run "TRAIN_FFB" TCDIFF_TRAIN_FFB=1 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16
run "TRAIN_XAB" TCDIFF_TRAIN_XAB=1 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16
run "TRAIN_ALL3" TCDIFF_TRAIN_SAB=1 TCDIFF_TRAIN_XAB=1 TCDIFF_TRAIN_FFB=1 BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16 BENCH_PROFILE_DIR=/tmp/prof_r3_train_stack
run "train control B" BENCH_MODE=train BENCH_BATCH=64 BENCH_DTYPE=bf16

# --- C. headline robustness (VERDICT r2 item 8): final default, reps 8 ---
run "headline reps8 session1" BENCH_REPS=8
run "headline reps8 session2" BENCH_REPS=8
# --- B. forecast-quality seed sweep (VERDICT r2 item 6) ---
echo "### forecast sweep seeds 0,1,2 dancers 3" >> $out
DYN_SEEDS=0,1,2 DYN_FORECAST_EVAL=2,3 DYN_SKIP_DBN=1 DYN_LOG=/root/repo/.dyn_r3_seeds.jsonl \
  timeout 7200 python tools/train_dynamics.py >> $out 2>/tmp/err_c3_dyn1.log
echo "### forecast sweep dancers 2 seed 0" >> $out
DYN_DANCERS=2 DYN_SEEDS=0 DYN_FORECAST_EVAL=2,3 DYN_SKIP_DBN=1 DYN_LOG=/root/repo/.dyn_r3_d2.jsonl \
  timeout 5400 python tools/train_dynamics.py >> $out 2>/tmp/err_c3_dyn2.log
echo "### forecast sweep longer-trained (1600 steps) seed 0" >> $out
DYN_STEPS=1600 DYN_SEEDS=0 DYN_FORECAST_EVAL=2,3 DYN_SKIP_DBN=1 DYN_LOG=/root/repo/.dyn_r3_long.jsonl \
  timeout 5400 python tools/train_dynamics.py >> $out 2>/tmp/err_c3_dyn3.log

echo '### DONE' >> $out
