#!/usr/bin/env bash
# Build the reference llama.cpp (CPU-only) so tests/test_reference_ab.py and
# tests/test_server_ab.py can A/B greedy token streams, quantizer bytes, and
# the server HTTP surface against the real binaries.
# Usage: scripts/build_reference.sh [BUILD_DIR]
# Default BUILD_DIR is <repo>/.refbuild (gitignored) so the binaries SURVIVE
# /tmp wipes between sessions — the A/B oracle must not silently decay.
set -euo pipefail
REF=${LLAMA_REF_SRC:-/root/reference}
REPO=$(cd "$(dirname "$0")/.." && pwd)
BUILD=${1:-$REPO/.refbuild}
cmake -S "$REF" -B "$BUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release \
    -DLLAMA_CURL=OFF -DLLAMA_BUILD_TESTS=OFF -DLLAMA_BUILD_SERVER=ON \
    -DGGML_NATIVE=ON
ninja -C "$BUILD" llama-cli llama-quantize llama-tokenize llama-perplexity \
    llama-server
echo "reference binaries in $BUILD/bin"
