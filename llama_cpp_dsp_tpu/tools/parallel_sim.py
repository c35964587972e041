"""Multi-client serving simulation (reference examples/parallel/parallel.cpp):
N concurrent clients ask M questions total through the continuous-batching
engine; reports per-client latency and aggregate throughput.

Usage: python -m llama_cpp_dsp_tpu.tools.parallel_sim -m model.gguf
           [-np 4] [-ns 16] [-n 32] [--temp 0]
"""

from __future__ import annotations

import argparse
import sys
import time

# reference examples/parallel/parallel.cpp k_questions (trimmed)
QUESTIONS = [
    "What is the meaning of life?",
    "Tell me an interesting fact about llamas.",
    "What is the best way to cook a steak?",
    "Are you familiar with the Special Theory of Relativity?",
    "Recommend some interesting books to read.",
    "What is the best way to learn a new language?",
    "How to get a job at Google?",
    "If you could have any superpower, what would it be?",
]

SYSTEM = ("A chat between a curious user and an artificial intelligence "
          "assistant. The assistant gives helpful answers.\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-np", "--parallel", type=int, default=4,
                    help="number of slots (reference -np)")
    ap.add_argument("-ns", "--sequences", type=int, default=8,
                    help="total requests to run (reference -ns)")
    ap.add_argument("-n", "--n-predict", type=int, default=32)
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--kv-layout", default="slots", choices=("slots", "paged"))
    args = ap.parse_args(argv)

    from ..runtime.engine import Engine, Request
    from ..runtime.loader import load_model
    from ..runtime.sampling import make_chain
    from ..utils.jax_setup import setup_jax

    setup_jax()
    model = load_model(args.model)
    engine = Engine(model, n_slots=args.parallel,
                    n_ctx_per_slot=args.ctx_size, kv_layout=args.kv_layout)
    engine.start()

    reqs = []
    t0 = time.perf_counter()
    for i in range(args.sequences):
        q = QUESTIONS[i % len(QUESTIONS)]
        ids = model.tokenizer.encode(SYSTEM + f"User: {q}\nAssistant:")
        req = Request(
            rid=i, prompt_tokens=ids, max_new_tokens=args.n_predict,
            sampler=make_chain(temp=args.temp, seed=i),
        )
        engine.submit(req)
        reqs.append(req)

    n_prompt = n_gen = 0
    for req in reqs:
        req.done.wait()
        text = model.tokenizer.decode(req.result_tokens)
        n_prompt += req.n_prompt
        n_gen += len(req.result_tokens)
        lat = (req.t_end - req.t_start) if req.t_end else 0.0
        ttft = (req.t_first_token - req.t_start) if req.t_first_token else 0.0
        print(f"client {req.rid:3d} | prompt {req.n_prompt:4d} t | "
              f"gen {len(req.result_tokens):4d} t | ttft {ttft*1e3:7.1f} ms | "
              f"total {lat*1e3:8.1f} ms | {text[:60]!r}")
    dt = time.perf_counter() - t0
    engine.stop()

    print(f"\nTotal: {args.sequences} sequences, {n_prompt} prompt + "
          f"{n_gen} gen tokens in {dt:.2f} s", file=sys.stderr)
    print(f"Aggregate throughput: {(n_prompt + n_gen) / dt:.2f} t/s "
          f"(gen only: {n_gen / dt:.2f} t/s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
