#!/bin/bash
# Wait for the TPU tunnel to come back (scripts/tpu_watch.sh writes
# /tmp/tpu_status on success), then immediately run the queued validation
# and benchmark passes so no chip time is wasted:
#   1. scripts/tpu_validate.py — incl. qmm_split_g (exercises the round-4
#      E-dot tail expand) and flash_decode_q8_allh
#   2. bench.py 13B tg128 — the E-dot tail A/B (last pinned: 74.84 without)
#   3. bench.py 7B tg128 headline re-pin
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
    timeout 3600 python scripts/tpu_validate.py --skip-bench
    echo "exit=$?"
    echo "=== bench.py 13B tg128 (E-dot tail A/B; prev 74.84) ==="
    timeout 2400 python bench.py --model llama2-13b --qtype q4_0 --steps 128
    echo "exit=$?"
    echo "=== bench.py 7B tg128 headline ==="
    timeout 2400 python bench.py --model llama2-7b --qtype q4_0 --steps 128
    echo "exit=$?"
} >> "$LOG" 2>&1
echo "done $(date -u +%FT%TZ)" >> "$LOG"
touch /tmp/tpu_return_done
