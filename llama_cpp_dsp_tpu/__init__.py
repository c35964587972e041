"""llama_cpp_dsp_tpu — a TPU-native quantized LLM inference framework.

A from-scratch re-design (JAX / XLA / Pallas / pjit) of the capability set of
the llama.cpp GGUF inference stack (reference: DreamChaser-luzeyu/llama.cpp.dsp):

- GGUF block-quant model files consumed in packed form by fused
  dequant-matmul Pallas kernels (capability parity with ggml-cuda MMQ/MMVQ,
  reference ggml/src/ggml-cuda/mmq.cuh, mmvq.cu).
- Unified, transactional, quantizable KV cache with sequence surgery
  (reference src/llama-kv-cache.cpp).
- ubatch decode engine, continuous batching, sampler chain, GBNF grammar,
  speculative decoding (reference src/llama-context.cpp, src/llama-sampling.cpp,
  common/speculative.cpp, examples/server/server.cpp).
- Multi-chip/multi-host scaling via jax.sharding Mesh + SPMD collectives
  over ICI (replaces reference split-mode tensor/layer parallelism and the
  ggml-rpc distributed backend).

The ggml tensor IR, ggml_backend_sched, and ggml-alloc of the reference
dissolve into XLA: tracing is the graph, GSPMD is the scheduler, XLA buffer
assignment is the allocator.
"""

__version__ = "0.1.0"
