"""Perplexity over a text corpus — capability mirror of
examples/perplexity/perplexity.cpp (:441 sliding-window loop).

Tokenizes the whole corpus, splits into n_ctx-sized windows, evaluates each
window in n_batch chunks, accumulates NLL over the second half of each
window (like the reference, the first half is context burn-in), prints
running PPL per chunk and the final PPL ± stderr.

Usage: python -m llama_cpp_dsp_tpu.tools.perplexity -m model.gguf -f wiki.test.raw
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def softmax_logprob(logits: np.ndarray, token: int) -> float:
    m = logits.max()
    lse = m + math.log(np.exp(logits - m).sum())
    return float(logits[token] - lse)


def compute_perplexity(model, text_tokens: list[int], *, n_ctx: int = 512,
                       n_batch: int = 512, compute_dtype=None, progress=True):
    import jax.numpy as jnp

    from ..models.llama import forward
    from ..runtime.kv_cache import KVCache, causal_mask

    compute_dtype = compute_dtype or jnp.bfloat16
    cfg = model.cfg
    n_chunks = len(text_tokens) // n_ctx
    if n_chunks == 0:
        raise ValueError(f"corpus too small: {len(text_tokens)} tokens < n_ctx {n_ctx}")

    import jax

    params = jax.tree.map(jnp.asarray, model.params)

    @jax.jit
    def eval_window(params, toks, positions):
        mask = causal_mask(positions, toks.shape[1], 0)
        logits, _ = forward(params, cfg, toks, positions, None, 0, mask,
                            compute_dtype=compute_dtype)
        return jax.nn.log_softmax(logits, axis=-1)

    nll = 0.0
    nll2 = 0.0
    count = 0
    first = n_ctx // 2  # reference: first half is burn-in (perplexity.cpp:560)
    bos = model.vocab.bos_id if model.vocab.add_bos else None
    for chunk in range(n_chunks):
        window = list(text_tokens[chunk * n_ctx : (chunk + 1) * n_ctx])
        toks = list(window)
        if bos is not None:
            toks[0] = bos  # reference replaces the first token with BOS (:560)
        arr = jnp.asarray(np.asarray(toks, np.int32)[None])
        pos = jnp.arange(n_ctx, dtype=jnp.int32)[None]
        logprobs = np.asarray(eval_window(params, arr, pos))[0]  # [T, V]
        for i in range(first, n_ctx - 1):
            lp = float(logprobs[i, window[i + 1]])
            nll += -lp
            nll2 += lp * lp
            count += 1
        if progress:
            print(f"[{chunk + 1}] {math.exp(nll / count):.4f}", file=sys.stderr, flush=True)
    ppl = math.exp(nll / count)
    mean = nll / count
    var = nll2 / count - mean * mean
    stderr = math.sqrt(var / count) * ppl
    return ppl, stderr, count


def _eval_logprobs(model, window: list[int], compute_dtype):
    """One full-recompute window → log-probs [T, V] (shared by PPL/KL/MC)."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import forward
    from ..runtime.kv_cache import causal_mask

    if not hasattr(model, "_ppl_eval"):
        params = jax.tree.map(jnp.asarray, model.params)

        @jax.jit
        def eval_window(params, toks, positions):
            mask = causal_mask(positions, toks.shape[1], 0)
            logits, _ = forward(params, model.cfg, toks, positions, None, 0,
                                mask, compute_dtype=compute_dtype)
            return jax.nn.log_softmax(logits, axis=-1)

        model._ppl_eval = (params, eval_window)
    params, eval_window = model._ppl_eval
    import jax.numpy as jnp

    arr = jnp.asarray(np.asarray(window, np.int32)[None])
    pos = jnp.arange(len(window), dtype=jnp.int32)[None]
    return np.asarray(eval_window(params, arr, pos))[0]


def save_logits(model, tokens: list[int], path: str, *, n_ctx: int = 512,
                compute_dtype=None) -> None:
    """Save per-window log-probs (f16) for later KL comparison — the role of
    the reference's --kl-divergence-base file (perplexity.cpp:1685)."""
    import jax.numpy as jnp

    compute_dtype = compute_dtype or jnp.float32
    n_chunks = len(tokens) // n_ctx
    outs = []
    for c in range(n_chunks):
        lp = _eval_logprobs(model, tokens[c * n_ctx : (c + 1) * n_ctx],
                            compute_dtype)
        outs.append(lp.astype(np.float16))
    np.savez_compressed(path, logprobs=np.stack(outs),
                        tokens=np.asarray(tokens[: n_chunks * n_ctx], np.int32))


def load_ref_logits(path: str):
    """Parse the reference's --kl-divergence-base binary format
    (perplexity.cpp log_softmax u16 compression: per scored position a
    (scale, min_log_prob) f32 header + n_vocab u16 quantized log-probs;
    positions [n_ctx/2, n_ctx-1) of each chunk are stored).

    Returns (logprobs [C, n_token, V], tokens [C, n_ctx], first)."""
    import struct

    with open(path, "rb") as f:
        if f.read(8) != b"_logits_":
            raise ValueError(f"{path}: not a reference logits file")
        n_ctx, n_vocab, n_chunk = struct.unpack("<iii", f.read(12))
        tokens = np.frombuffer(f.read(4 * n_ctx * n_chunk), dtype=np.int32)
        tokens = tokens.reshape(n_chunk, n_ctx)
        first = n_ctx // 2
        n_token = n_ctx - 1 - first
        nv = 2 * ((n_vocab + 1) // 2) + 4
        out = np.empty((n_chunk, n_token, n_vocab), np.float32)
        for c in range(n_chunk):
            buf = np.frombuffer(f.read(n_token * nv * 2), dtype=np.uint16)
            buf = buf.reshape(n_token, nv)
            hdr = buf[:, :4].copy().view(np.float32)  # scale, min_log_prob
            q = buf[:, 4:4 + n_vocab].astype(np.float32)
            out[c] = hdr[:, 0:1] * q + hdr[:, 1:2]
    return out, tokens, first


def kl_divergence(model, base_path: str, *, compute_dtype=None,
                  progress=True):
    """Mean KL(base ‖ model) per token + top-1 agreement vs a saved base run
    (reference kl_divergence, perplexity.cpp:1685). Reads both our .npz
    format (save_logits) and the reference binary --kl-divergence-base
    format."""
    import jax.numpy as jnp

    compute_dtype = compute_dtype or jnp.float32
    with open(base_path, "rb") as f:
        is_ref = f.read(8) == b"_logits_"
    if is_ref:
        return _kl_divergence_ref(model, base_path, compute_dtype, progress)
    data = np.load(base_path)
    base = data["logprobs"].astype(np.float32)  # [C, T, V]
    tokens = [int(t) for t in data["tokens"]]
    n_chunks, n_ctx, _ = base.shape
    kl_sum = 0.0
    n = 0
    agree = 0
    for c in range(n_chunks):
        lp = _eval_logprobs(model, tokens[c * n_ctx : (c + 1) * n_ctx],
                            compute_dtype)
        b = base[c]
        kl = np.sum(np.exp(b) * (b - lp), axis=-1)  # [T]
        kl_sum += float(kl.sum())
        agree += int((b.argmax(-1) == lp.argmax(-1)).sum())
        n += n_ctx
        if progress:
            print(f"[{c+1}] mean KL {kl_sum/n:.6f}", file=sys.stderr, flush=True)
    return kl_sum / n, agree / n


def _kl_divergence_ref(model, base_path, compute_dtype, progress):
    """KL vs a reference --kl-divergence-base file: evaluate each chunk with
    the reference's BOS substitution and compare only the stored (scored)
    positions."""
    base, tokens, first = load_ref_logits(base_path)
    bos = model.vocab.bos_id if model.vocab.add_bos else None
    kl_sum = 0.0
    n = 0
    agree = 0
    for c in range(base.shape[0]):
        win = [int(t) for t in tokens[c]]
        toks = list(win)
        if bos is not None:
            toks[0] = bos
        lp = _eval_logprobs(model, toks, compute_dtype)[first:-1]
        b = base[c]
        kl = np.sum(np.exp(b) * (b - lp), axis=-1)
        kl_sum += float(kl.sum())
        agree += int((b.argmax(-1) == lp.argmax(-1)).sum())
        n += b.shape[0]
        if progress:
            print(f"[{c+1}] mean KL {kl_sum/n:.6f}", file=sys.stderr, flush=True)
    return kl_sum / n, agree / n


def multiple_choice_score(model, tasks: list[dict], *, compute_dtype=None,
                          progress=True) -> float:
    """Hellaswag/MMLU-style accuracy: pick the ending with the highest
    length-normalized log-prob (reference hellaswag_score,
    perplexity.cpp:780). tasks: [{"context": str|ids, "endings": [...],
    "label": int}]."""
    import jax.numpy as jnp

    compute_dtype = compute_dtype or jnp.float32
    tok = model.tokenizer
    correct = 0
    for ti, task in enumerate(tasks):
        ctx = task["context"]
        ctx_ids = tok.encode(ctx, add_special=True) if isinstance(ctx, str) else list(ctx)
        scores = []
        for ending in task["endings"]:
            end_ids = (tok.encode(ending, add_special=False)
                       if isinstance(ending, str) else list(ending))
            window = ctx_ids + end_ids
            lp = _eval_logprobs(model, window, compute_dtype)
            s = sum(float(lp[i, window[i + 1]])
                    for i in range(len(ctx_ids) - 1, len(window) - 1))
            scores.append(s / max(len(end_ids), 1))
        if int(np.argmax(scores)) == int(task["label"]):
            correct += 1
        if progress:
            print(f"[{ti+1}/{len(tasks)}] acc {correct/(ti+1):.4f}",
                  file=sys.stderr, flush=True)
    return correct / max(len(tasks), 1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-perplexity", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=0)
    ap.add_argument("--compute-dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--save-logits", metavar="PATH",
                    help="save per-window logprobs for later --kl-divergence")
    ap.add_argument("--kl-divergence", metavar="PATH",
                    help="compare against logits saved with --save-logits")
    ap.add_argument("--multiple-choice", action="store_true",
                    help="treat -f as a JSON file of multiple-choice tasks")
    from ..utils.args import parse_with_env

    args = parse_with_env(ap, argv)

    from ..utils.jax_setup import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from ..runtime.loader import load_model

    model = load_model(args.model)
    dtype = jnp.float32 if args.compute_dtype == "float32" else jnp.bfloat16

    if args.multiple_choice:
        import json

        tasks = json.loads(open(args.file, encoding="utf-8").read())
        acc = multiple_choice_score(model, tasks, compute_dtype=dtype)
        print(f"Final accuracy: {acc*100:.2f}% over {len(tasks)} tasks")
        return 0

    if args.kl_divergence:
        kl, top1 = kl_divergence(model, args.kl_divergence, compute_dtype=dtype)
        print(f"Mean KL = {kl:.6f}; top-1 agreement = {top1*100:.2f}%")
        return 0

    text = open(args.file, encoding="utf-8").read()
    # reference tokenizes the corpus WITH special tokens (perplexity.cpp:471
    # common_tokenize(ctx, params.prompt, true)) — the leading BOS shifts
    # every chunk boundary, so omitting it changes every scored position
    ids = model.tokenizer.encode(text, add_special=True)
    if args.max_chunks:
        ids = ids[: args.max_chunks * args.ctx_size]
    print(f"tokenized {len(ids)} tokens; {len(ids)//args.ctx_size} chunks", file=sys.stderr)
    if args.save_logits:
        save_logits(model, ids, args.save_logits, n_ctx=args.ctx_size,
                    compute_dtype=dtype)
        print(f"saved base logprobs to {args.save_logits}")
        return 0
    ppl, err, n = compute_perplexity(
        model, ids, n_ctx=args.ctx_size, compute_dtype=dtype,
    )
    print(f"Final estimate: PPL = {ppl:.4f} +/- {err:.5f} over {n} tokens")
    return 0


if __name__ == "__main__":
    sys.exit(main())
