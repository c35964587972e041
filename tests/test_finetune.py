"""LoRA fine-tune convergence — role of reference test-opt (AdamW on toy
problems) + export to a reference-format adapter that round-trips through
runtime/adapter.py.
"""

import numpy as np
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.tools.finetune import save_lora, train_lora

from model_builder import build_tiny_llama


def test_lora_finetune_converges_and_roundtrips(tmp_path):
    src = str(tmp_path / "base.gguf")
    build_tiny_llama(src, qtype=GGMLType.F32)
    model = load_model(src)

    # memorize two fixed sequences
    seqs = [[3, 17, 42, 9, 3, 17, 42, 9], [5, 5, 8, 20, 5, 5, 8, 20]]
    lora, losses = train_lora(model, seqs, rank=4, steps=60, lr=5e-2,
                              progress=False)
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    # export + reload through the serving adapter path
    path = str(tmp_path / "trained.gguf")
    save_lora(path, lora, model, alpha=16.0)
    from llama_cpp_dsp_tpu.runtime.adapter import apply_lora, load_lora

    adapter = load_lora(path)
    assert adapter.rank == 4
    params2 = apply_lora(model.params, adapter)

    # adapted logits on the training prefix should prefer the memorized token
    from llama_cpp_dsp_tpu.models.llama import forward

    toks = np.asarray([seqs[0][:4]], np.int32)
    pos = np.arange(4, dtype=np.int32)[None]
    mask = np.tril(np.ones((1, 4, 4), bool))
    base_logits, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                             jnp.asarray(pos), mask=mask,
                             compute_dtype=jnp.float32)
    tuned_logits, _ = forward(params2, model.cfg, jnp.asarray(toks),
                              jnp.asarray(pos), mask=mask,
                              compute_dtype=jnp.float32)
    tgt = seqs[0][4]
    b = np.asarray(base_logits)[0, -1]
    t = np.asarray(tuned_logits)[0, -1]
    # training moved probability mass toward the memorized continuation
    assert (t[tgt] - np.log(np.exp(t).sum())) > (b[tgt] - np.log(np.exp(b).sum()))
