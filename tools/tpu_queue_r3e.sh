#!/bin/bash
# Re-run train dynamics with the single-compile eval fix and a longer
# timeout (the first run hit its 45 min cap at step 370/400 because the
# post-eval re-jitted the sampler — another 10-15 min axon compile).
set -u
cd /root/repo
LOG=/tmp/tpu_r3e.log
: > "$LOG"
while ! grep -q "QUEUE-R3D DONE" /tmp/tpu_r3d.log 2>/dev/null; do sleep 30; done
echo "=== train dynamics rerun ($(date +%H:%M:%S))" >> "$LOG"
env DYN_STEPS=400 DYN_BATCH=32 timeout 5400 python tools/train_dynamics.py >> "$LOG" 2>&1
echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
echo "QUEUE-R3E DONE" >> "$LOG"
