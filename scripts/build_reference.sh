#!/usr/bin/env bash
# Build the reference llama.cpp (CPU-only) so tests/test_reference_ab.py can
# A/B greedy token streams and quantizer bytes against the real binaries.
# Usage: scripts/build_reference.sh [BUILD_DIR]   (default /tmp/refbuild)
set -euo pipefail
REF=${LLAMA_REF_SRC:-/root/reference}
BUILD=${1:-/tmp/refbuild}
cmake -S "$REF" -B "$BUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release \
    -DLLAMA_CURL=OFF -DLLAMA_BUILD_TESTS=OFF -DLLAMA_BUILD_SERVER=OFF \
    -DGGML_NATIVE=ON
ninja -C "$BUILD" llama-cli llama-quantize llama-tokenize llama-perplexity
echo "reference binaries in $BUILD/bin"
