#!/bin/bash
# Wait for the TPU tunnel (scripts/tpu_watch.sh writes /tmp/tpu_status),
# then run the queued validation + benches. Logs /tmp/tpu_return.log.
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
    echo "=== tpu_validate (E-dot tail + paged allh + q8 allh) ==="
    timeout 3600 python scripts/tpu_validate.py --skip-bench
    echo "exit=$?"
    echo "=== 13B tg128 (E-dot tail A/B; prev 74.84) ==="
    timeout 2400 python bench.py --model llama2-13b --qtype q4_0 --steps 128
    echo "=== 13B tg128 tn=1024 experiment ==="
    LLAMA_TPU_TILE_N_WIDE=1024 LLAMA_TPU_VMEM_BUDGET_MB=18 \
      timeout 2400 python bench.py --model llama2-13b --qtype q4_0 --steps 128
    echo "=== 7B tg128 headline ==="
    timeout 2400 python bench.py --model llama2-7b --qtype q4_0 --steps 128
} >> "$LOG" 2>&1
echo "done $(date -u +%FT%TZ)" >> "$LOG"
touch /tmp/tpu_return_done
