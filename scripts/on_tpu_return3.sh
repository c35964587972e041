#!/bin/bash
# Phase 3: the full BENCH_FULL_r04 matrix (resumes from --out; phase 2
# already recorded the round-4-sensitive sections).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_return3.log
echo "waiting for /tmp/tpu_return2_done $(date -u +%FT%TZ)" > "$LOG"
while [ ! -f /tmp/tpu_return2_done ]; do
    sleep 120
done
{
    echo "=== bench_full: full matrix ==="
    timeout 28000 python scripts/bench_full.py --out BENCH_FULL_r04.json
    echo "exit=$?"
} >> "$LOG" 2>&1
echo "done $(date -u +%FT%TZ)" >> "$LOG"
touch /tmp/tpu_return3_done
