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
  # never put a probe (a full TPU client init) on the chip while a
  # campaign or interactive bench owns it, or while a driver-fired bench
  # is waiting/running (/tmp/tpu_wanted, see bench.py; markers older than
  # 120 min are a crashed bench — ignore them)
  if [ -e /tmp/tpu_busy ]; then sleep 480; continue; fi
  if [ -e /tmp/tpu_wanted ] && [ -z "$(find /tmp/tpu_wanted -mmin +120 2>/dev/null)" ]; then
    sleep 480; continue
  fi
  # -k 30: a hung axon client init can ignore SIGTERM (observed 09:24
  # 2026-08-18 — a 300 s probe wedged for 38+ min); SIGKILL backstop
  if timeout -k 30 300 python -c "import jax; d=jax.devices(); print('TPU-OK', d)" >> "$LOG" 2>&1; then
    echo "RECOVERED $(date -u)" >> "$LOG"
    break
  fi
  echo "still down $(date -u)" >> "$LOG"
  sleep 480
done
bash "$CAMPAIGN"
