"""Training / optimization (reference ggml-opt role).

`opt` mirrors the ggml-opt API surface (ggml/include/ggml-opt.h) the JAX
way: jit + jax.grad + optax replace the hand-built backward graphs and
ggml_opt_step_adamw (ggml/src/ggml-opt.cpp:447). `full` is full-parameter
fine-tuning of a loaded GGUF model through the same forward() used for
serving, with save-back to GGUF.
"""

from .opt import AdamWParams, Dataset, LossType, Result, epoch, fit  # noqa: F401
