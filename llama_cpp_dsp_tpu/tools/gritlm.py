"""GritLM dual-mode demo (reference examples/gritlm/gritlm.cpp): one model
serves both instruction-conditioned embeddings (mean-pooled over the
response span only) and normal text generation.

Usage: python -m llama_cpp_dsp_tpu.tools.gritlm -m gritlm.gguf
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def gritlm_instruction(instruction: str) -> str:
    # reference gritlm.cpp gritlm_instruction()
    if instruction:
        return f"<|user|>\n{instruction}\n<|embed|>\n"
    return "<|embed|>\n"


def encode(engine, tokenizer, texts: list[str], instruction: str) -> np.ndarray:
    """Mean-pool ONLY the document span (the instruction prefix is excluded
    from the pool, reference gritlm.cpp:20-60), then L2-normalize."""
    prefix = gritlm_instruction(instruction)
    out = []
    for text in texts:
        pre_ids = tokenizer.encode(prefix)
        all_ids = tokenizer.encode(prefix + text)
        tok_emb = engine.embed(all_ids, pooling="none")  # [T, D]
        span = tok_emb[len(pre_ids):] if len(all_ids) > len(pre_ids) else tok_emb
        v = span.mean(axis=0)
        out.append(v / (np.linalg.norm(v) + 1e-12))
    return np.stack(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    args = ap.parse_args(argv)

    from ..runtime.engine import Engine
    from ..runtime.loader import load_model
    from ..runtime.sampling import make_chain
    from ..utils.jax_setup import setup_jax

    setup_jax()
    model = load_model(args.model)
    engine = Engine(model, n_slots=1, n_ctx_per_slot=args.ctx_size)

    # --- embedding mode (reference gritlm.cpp main, sample data) ---
    instruction = "Given a scientific paper title, retrieve the paper's abstract"
    queries = [
        "Bitcoin: A Peer-to-Peer Electronic Cash System",
        "Generative Representational Instruction Tuning",
    ]
    documents = [
        "A purely peer-to-peer version of electronic cash would allow online "
        "payments to be sent directly from one party to another without going "
        "through a financial institution.",
        "All text-based language problems can be reduced to either generation "
        "or embedding. Current models only perform well at one or the other.",
    ]
    dv = encode(engine, model.tokenizer, documents, "")
    qv = encode(engine, model.tokenizer, queries, instruction)
    sims = qv @ dv.T
    for i, q in enumerate(queries):
        for j, d in enumerate(documents):
            print(f'cosine sim q{i} × d{j}: {sims[i, j]:.3f}  '
                  f'("{q[:40]}…" × "{d[:40]}…")')

    # --- generative mode ---
    prompt = "<|user|>\nPlease write me a poem about my recent hike of Mt. Fuji "
    prompt += "at midnight in the style of Shakespeare.\n<|assistant|>\n"
    req = engine.generate_sync(model.tokenizer.encode(prompt),
                               max_new_tokens=args.n_predict,
                               sampler=make_chain(temp=0.0))
    print("\n" + model.tokenizer.decode(req.result_tokens))
    return 0


if __name__ == "__main__":
    sys.exit(main())
