#!/bin/bash
# Wait for the TPU tunnel to come back (scripts/tpu_watch.sh writes
# /tmp/tpu_status on success), then immediately run the queued validation
# and benchmark passes so no chip time is wasted:
#   1. scripts/tpu_validate.py  — compile-checks the kernels added while the
#      tunnel was down (qmm_expert_rows, flash_decode_q4, mla_flash_decode,
#      chunked decode scan)
#   2. bench.py                 — single-stream tg64 (the headline number)
#   3. bench.py --batch 4       — batched aggregate throughput
# Logs to /tmp/tpu_return.log; writes /tmp/tpu_return_done when finished.
# Usage: nohup bash scripts/on_tpu_return.sh &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_return.log
rm -f /tmp/tpu_return_done
echo "waiting for /tmp/tpu_status $(date -u +%FT%TZ)" > "$LOG"
while [ ! -f /tmp/tpu_status ]; do
    sleep 60
done
echo "TPU BACK $(date -u +%FT%TZ)" >> "$LOG"
{
    echo "=== tpu_validate.py ==="
    timeout 3600 python scripts/tpu_validate.py
    echo "exit=$?"
    echo "=== bench.py (tg64 single-stream) ==="
    timeout 2400 python bench.py
    echo "exit=$?"
    echo "=== bench.py --batch 4 ==="
    timeout 2400 python bench.py --batch 4
    echo "exit=$?"
} >> "$LOG" 2>&1
echo "done $(date -u +%FT%TZ)" >> "$LOG"
touch /tmp/tpu_return_done
