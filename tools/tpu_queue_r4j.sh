#!/bin/bash
# Capture an xplane profile of the new default sampler and summarize it.
set -u
cd /root/repo
LOG=/tmp/tpu_r4j.log
: > "$LOG"
while ! grep -q "QUEUE-R4I DONE" /tmp/tpu_r4i.log 2>/dev/null; do sleep 30; done

echo "=== profile capture ($(date +%H:%M:%S))" >> "$LOG"
rm -rf /tmp/xprof_r4j
env BENCH_REPS=3 BENCH_PROFILE_DIR=/tmp/xprof_r4j timeout 2700 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
echo "=== parse ($(date +%H:%M:%S))" >> "$LOG"
timeout 600 /opt/venv/bin/python tools/parse_xplane.py /tmp/xprof_r4j 30 >> "$LOG" 2>&1
echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
echo "QUEUE-R4J DONE" >> "$LOG"
