#!/bin/bash
# Profile the FINAL round-2 default for the record / next round.
set -u
cd /root/repo
LOG=/tmp/tpu_r4p.log
: > "$LOG"
echo "=== final profile capture ($(date +%H:%M:%S))" >> "$LOG"
rm -rf /tmp/xprof_r4p
env BENCH_REPS=3 BENCH_PROFILE_DIR=/tmp/xprof_r4p timeout 2700 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
echo "=== parse ($(date +%H:%M:%S))" >> "$LOG"
timeout 600 /opt/venv/bin/python tools/parse_xplane.py /tmp/xprof_r4p 20 >> "$LOG" 2>&1
echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
echo "QUEUE-R4P DONE" >> "$LOG"
