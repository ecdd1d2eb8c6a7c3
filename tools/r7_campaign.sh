#!/bin/bash
# Round-7 measurement campaign, run back-to-back in one quiet window:
#  1. 3 fair-node reps at 8.67M (VERDICT r6 item 1, the starred item)
#  2. shaping determinism leg at 2M (item 6; r6 ran it at 650k)
#  3. one-action vs two-action instrumentation A/B at 2M, 4x8 (item 5)
# Every leg is bw-probe stamped by tools/scaling_r7.py.
set -u
cd /root/repo
LOG=BENCH/r7_campaign.log
echo "=== r7 campaign start $(date -u +%FT%TZ) ===" >> "$LOG"

echo "--- leg 1: 8.67M fair-node x3 ---" >> "$LOG"
python tools/scaling_r7.py 8000000 3 16384 >> "$LOG" 2>&1

echo "--- leg 2: 2M shaping determinism x2 ---" >> "$LOG"
python tools/scaling_r7.py 2000000 2 16384 --shaping >> "$LOG" 2>&1

echo "--- leg 3: one-action vs two-action A/B at 2M 4x8 ---" >> "$LOG"
python tools/oneaction_ab.py >> "$LOG" 2>&1

echo "=== r7 campaign done $(date -u +%FT%TZ) ===" >> "$LOG"
