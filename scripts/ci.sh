#!/usr/bin/env bash
# Full-stack CI — role of the reference's ci/run.sh: unit tests, then a
# real pipeline (build tiny GGUF → CLI generate → quantize → perplexity
# sanity → server smoke) on whatever device JAX finds.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== reference binaries (A/B oracle) =="
# The byte-identity A/B vs the reference binaries is the project's
# strongest correctness statement; it must not silently decay. Build the
# persistent in-repo copy when absent, and FAIL if the A/B suites skip.
REFBIN=${LLAMA_REF_BIN:-$PWD/.refbuild/bin}
if [ ! -x "$REFBIN/llama-cli" ] || [ ! -x "$REFBIN/llama-server" ]; then
    echo "reference binaries missing — building (one-time, slow on 1 core)"
    bash scripts/build_reference.sh "$(dirname "$REFBIN")"
fi
test -x "$REFBIN/llama-cli" || { echo "FATAL: reference build failed"; exit 1; }
export LLAMA_REF_BIN="$REFBIN"

echo "== unit tests =="
python -m pytest tests/ -q

echo "== reference A/B suites must RUN (no silent skips) =="
AB_OUT=$(python -m pytest tests/test_reference_ab.py tests/test_server_ab.py -q 2>&1 | tail -2)
echo "$AB_OUT"
if echo "$AB_OUT" | grep -qE "skipped|no tests ran"; then
    echo "FATAL: reference A/B suites skipped — oracle is inert"; exit 1
fi

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

echo "== build tiny model =="
python - <<EOF
import sys; sys.path.insert(0, "tests")
from model_builder import build_tiny_llama
build_tiny_llama("$TMP/tiny_f32.gguf", qtype=0)
build_tiny_llama("$TMP/tiny_q8.gguf", qtype=8)
EOF

echo "== cli generate (greedy, both quants) =="
python -m llama_cpp_dsp_tpu.tools.cli -m "$TMP/tiny_f32.gguf" -p "ab" -n 8 --temp 0 -c 64 --no-display-prompt
python -m llama_cpp_dsp_tpu.tools.cli -m "$TMP/tiny_q8.gguf" -p "ab" -n 8 --temp 0 -c 64 -ctk q8_0 --no-display-prompt

echo "== requantize f32 -> q4_0 and run =="
python -m llama_cpp_dsp_tpu.tools.quantize "$TMP/tiny_f32.gguf" "$TMP/tiny_q4.gguf" Q4_0
python -m llama_cpp_dsp_tpu.tools.cli -m "$TMP/tiny_q4.gguf" -p "ab" -n 8 --temp 0 -c 64 --no-display-prompt

echo "== full-parameter finetune round trip =="
printf 'the quick brown fox jumps %.0s' {1..60} > "$TMP/train.txt"
python -m llama_cpp_dsp_tpu.tools.train -m "$TMP/tiny_f32.gguf" -f "$TMP/train.txt" \
    -o "$TMP/tiny_tuned.gguf" --steps 4 --seq-len 16
python -m llama_cpp_dsp_tpu.tools.cli -m "$TMP/tiny_tuned.gguf" -p "ab" -n 4 --temp 0 -c 64 --no-display-prompt

echo "== perplexity sanity (runs, finite) =="
python - <<EOF
import sys; sys.path.insert(0, "tests")
import numpy as np
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.tools.perplexity import compute_perplexity
m = load_model("$TMP/tiny_q8.gguf")
toks = [int(t) for t in np.random.default_rng(0).integers(3, 250, 128)]
ppl, err, n = compute_perplexity(m, toks, n_ctx=32, progress=False)
assert np.isfinite(ppl), ppl
print(f"ppl={ppl:.2f} over {n} tokens")
EOF

echo "== real-TPU kernel validation (skipped when no TPU) =="
# role of test-backend-ops.cpp as a hardware bring-up oracle: CI's unit
# tests run Pallas in interpret mode on CPU, so every kernel entry point
# must additionally be proven on the real chip whenever one is reachable
PLATFORM=$(timeout 300 python -c "import jax,sys;sys.stdout.write(jax.devices()[0].platform)" 2>/dev/null || echo none)
if [ "$PLATFORM" = "tpu" ]; then
    python scripts/tpu_validate.py --skip-bench
else
    echo "no TPU found (platform=$PLATFORM); skipping"
fi

echo "== CI PASS =="
