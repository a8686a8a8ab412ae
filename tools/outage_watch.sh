#!/bin/bash
# Outage playbook, automated (VERDICT r3 #8): keep probing the axon
# backend; the moment it answers, fire the campaign given as $1
# (default tools/bench_campaign_r4.sh). Standalone — does not depend on a
# prior probe loop. Probe = client init + jax.devices() in a subprocess
# with a 300 s timeout (a healthy init is < 2 min through the tunnel).
# Usage: nohup bash tools/outage_watch.sh >/dev/null 2>&1 &
set -u
cd /root/repo
CAMPAIGN=${1:-tools/bench_campaign_r4.sh}
LOG=/tmp/tpu_probe.log
while true; do
  if timeout 300 python -c "import jax; d=jax.devices(); print('TPU-OK', d)" >> "$LOG" 2>&1; then
    echo "RECOVERED $(date -u)" >> "$LOG"
    break
  fi
  echo "still down $(date -u)" >> "$LOG"
  sleep 480
done
bash "$CAMPAIGN"
