#!/bin/bash
# Phase 2 after scripts/on_tpu_return.sh: refresh the BENCH_FULL matrix
# sections most affected by round-4 changes, into BENCH_FULL_r04.json.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_return2.log
echo "waiting for /tmp/tpu_return_done $(date -u +%FT%TZ)" > "$LOG"
while [ ! -f /tmp/tpu_return_done ]; do
    sleep 120
done
{
    echo "=== bench_full: q8kv paged spec mixed (round-4 changes) ==="
    timeout 14000 python scripts/bench_full.py --out BENCH_FULL_r04.json \
        --only q8kv,paged,spec,spec_decode_small_draft,mixed_kv_decode,q4kv
    echo "exit=$?"
} >> "$LOG" 2>&1
echo "done $(date -u +%FT%TZ)" >> "$LOG"
touch /tmp/tpu_return2_done
