#!/bin/bash
# Round-5 13B/7B attribution A/Bs (VERDICT r4 items #2 and #4): interleaved
# same-window runs per the A/B protocol (CLAUDE.md — cross-window tunnel
# drift ±1.5 t/s swamps 3-5% effects). Uses the synth pickle cache so each
# invocation skips the ~450 s 13B materialization.
# Run AFTER bench_full phase 1 releases the chip. Logs /tmp/r5_ab.log.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5_ab.log}
export LLAMA_TPU_SYNTH_CACHE=/tmp/synth_cache
B13="python bench.py --model llama2-13b --qtype q4_0 --steps 128"
B7="python bench.py --model llama2-7b --qtype q4_0 --steps 128"
{
    echo "=== r5 A/B queue start $(date -u +%FT%TZ) ==="
    echo "--- 13B default (re-pin post-gating; pre-outage pin 74.84) #1 ---"
    timeout 2400 $B13
    echo "--- 13B FUSED_FFN=1 (attribution: was confounded with E-dot) ---"
    LLAMA_TPU_FUSED_FFN=1 timeout 2400 $B13
    echo "--- 13B default #2 (interleave) ---"
    timeout 2400 $B13
    echo "--- 13B FUSED_FFN=1 + MEGA_FFN=1 (mega never perf-measured) ---"
    LLAMA_TPU_FUSED_FFN=1 LLAMA_TPU_MEGA_FFN=1 timeout 2400 $B13
    echo "--- 13B tn=1024 experiment ---"
    LLAMA_TPU_TILE_N_WIDE=1024 LLAMA_TPU_VMEM_BUDGET_MB=18 timeout 2400 $B13
    echo "--- 13B default #3 (interleave) ---"
    timeout 2400 $B13
    echo "--- 13B FUSED_ATTN=1 (new fused qkv+rope+write+flash kernel) ---"
    LLAMA_TPU_FUSED_ATTN=1 timeout 2400 $B13
    echo "--- 7B default (headline re-pin) #1 ---"
    timeout 2400 $B7
    echo "--- 7B FUSED_FFN=1 + MEGA_FFN=1 ---"
    LLAMA_TPU_FUSED_FFN=1 LLAMA_TPU_MEGA_FFN=1 timeout 2400 $B7
    echo "--- 7B FUSED_ATTN=1 ---"
    LLAMA_TPU_FUSED_ATTN=1 timeout 2400 $B7
    echo "--- 7B default #2 (interleave) ---"
    timeout 2400 $B7
    echo "--- 13B tg512 row (bar 78.08; r03 pinned 63.95 pre-split-G) ---"
    timeout 3600 python bench.py --model llama2-13b --qtype q4_0 --steps 512
    echo "=== done $(date -u +%FT%TZ) ==="
} >> "$LOG" 2>&1
touch /tmp/r5_ab_done
