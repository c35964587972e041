"""Quantized-KV-cache quality, anchored to the reference binary.

Role of the reference's Δ-PPL-per-cache-type evidence (common/arg.cpp:699
cache-type matrix measured through examples/perplexity). Protocol: build a
tiny F32 GGUF + synthetic corpus, dump the reference's own F32 base logits
(`--kl-divergence-base`), then score BOTH stacks' quantized-KV runs against
that same base on the same positions (each chunk's second half, matching
perplexity.cpp) — mean KL + top-1 agreement, apples-to-apples.

History note: the earlier per-row-scale harness scored a random-weight
synth model at EVERY position and reported KL 1.3 (q8) / 12 (q4) — a
measurement artifact of knife-edge random logits, not cache quality. Under
this reference-anchored protocol the same caches measure q8_0 ≈ 5.6e-5
(the f32-rerun floor is 2.3e-5) and q4_0 ≈ 6.9e-3 vs the reference
binary's own 6.1e-3 / 76.2% top-1.

Run: python scripts/kv_quality.py [--ref-bin /tmp/refbuild/bin]
Prints a markdown table for the README. Reference rows appear only when
the binaries exist (scripts/build_reference.sh).
"""

from __future__ import annotations

import argparse
import os
import random
import re
import subprocess
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

WORDS = ["the", "fox", "jumps", "over", "lazy", "dog", "a", "quick",
         "brown", "and", "runs", "far", "then", "stops", "to", "rest"]


def run_ours(model, base, tokens, first, kv: str, bos, kv_v: str | None = None):
    """Teacher-forced single-token decode (every position reads the
    accumulated quantized cache) scored on the reference's positions."""
    import numpy as np

    from llama_cpp_dsp_tpu.runtime.context import LlamaContext

    kl_sum = n = agree = 0
    for c in range(base.shape[0]):
        toks = [int(t) for t in tokens[c]]
        if bos is not None:
            toks[0] = bos
        ctx = LlamaContext(model, n_ctx=len(toks) + 2, kv_dtype=kv,
                           kv_v_dtype=kv_v)
        lps = []
        for t in toks:
            lg = np.asarray(ctx.eval_tokens([t]), np.float64)
            e = lg - lg.max()
            lps.append(e - np.log(np.exp(e).sum()))
        lp = np.stack(lps)[first:-1]
        b = base[c]
        kl_sum += float((np.exp(b) * (b - lp)).sum())
        agree += int((b.argmax(-1) == lp.argmax(-1)).sum())
        n += b.shape[0]
    return kl_sum / n, agree / n


def run_ref(ref_bin, gguf, corpus, base_path, kv: str, kv_v: str | None = None):
    p = subprocess.run(
        [os.path.join(ref_bin, "llama-perplexity"), "-m", gguf, "-f", corpus,
         "-c", "64", "-ctk", kv, "-ctv", kv_v or kv, "-fa",
         "--kl-divergence-base", base_path, "--kl-divergence"],
        capture_output=True, timeout=600)
    out = p.stdout + p.stderr
    kl = float(re.search(rb"Mean\s+KLD:\s+([0-9.e+-]+)", out).group(1))
    top1 = float(re.search(rb"Same top p:\s+([0-9.]+)", out).group(1)) / 100
    return kl, top1


def main() -> int:
    ap = argparse.ArgumentParser()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default_bin = next(
        (c for c in (os.path.join(repo, ".refbuild", "bin"),
                     "/tmp/refbuild/bin")
         if os.path.exists(os.path.join(c, "llama-cli"))),
        os.path.join(repo, ".refbuild", "bin"))
    ap.add_argument("--ref-bin", default=os.environ.get(
        "LLAMA_REF_BIN", default_bin))
    ap.add_argument("--gguf", default="/tmp/kv_quality_f32.gguf")
    args = ap.parse_args()

    from llama_cpp_dsp_tpu.utils.jax_setup import setup_jax

    setup_jax(platform="cpu")

    from model_builder import build_tiny_llama

    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.tools.perplexity import load_ref_logits, save_logits

    build_tiny_llama(args.gguf, qtype=GGMLType.F32, n_embd=256, n_ff=512)
    corpus = "/tmp/kv_quality.txt"
    rng = random.Random(0)
    with open(corpus, "w") as f:
        f.write(" ".join(rng.choice(WORDS) for _ in range(220)))

    model = load_model(args.gguf)
    bos = model.vocab.bos_id if model.vocab.add_bos else None
    base_path = "/tmp/kv_quality_f32.logits"
    have_ref = os.path.exists(os.path.join(args.ref_bin, "llama-perplexity"))
    if have_ref:
        subprocess.run(
            [os.path.join(args.ref_bin, "llama-perplexity"), "-m", args.gguf,
             "-f", corpus, "-c", "64", "--kl-divergence-base", base_path],
            capture_output=True, timeout=600, check=True)
    else:
        # self-anchored fallback: our own f32 full-recompute logits as base
        ids = model.tokenizer.encode(open(corpus).read(), add_special=True)
        save_logits(model, ids, base_path + ".npz", n_ctx=64)
        print("(reference binaries absent — self-anchored base)",
              file=sys.stderr)
        base_path += ".npz"

    if base_path.endswith(".npz"):
        import numpy as np

        data = np.load(base_path)
        base = data["logprobs"].astype(np.float64)
        tokens = data["tokens"].reshape(base.shape[0], -1)
        # run_ours scores positions [first, n_ctx-1): drop the base's last
        # row (its prediction target lies beyond the chunk) to align, and
        # skip the reference's per-chunk BOS substitution — the npz base
        # was evaluated on the raw token stream
        base = base[:, :-1]
        first = 0
        bos = None
    else:
        base, tokens, first = load_ref_logits(base_path)

    print("| K type | V type | ours: KL / top-1 | reference binary: KL / top-1 |")
    print("|---|---|---|---|")
    # homogeneous rows + the split -ctk/-ctv operating points (q8 K + q4 V
    # keeps more bits where quantization hurts more; q4_1 V adds the
    # per-group min for one-sided V rows) — reference cache-type matrix,
    # common/arg.cpp:699
    for kv, kv_v in (("f32", None), ("bf16", None), ("q8_0", None),
                     ("q4_0", None), ("q4_1", None), ("q5_0", None),
                     ("q5_1", None), ("iq4_nl", None),
                     ("q8_0", "q4_0"), ("q8_0", "q4_1")):
        kl, t1 = run_ours(model, base, tokens, first, kv, bos, kv_v)
        ref_kv = "f16" if kv == "f32" else kv
        if have_ref and ref_kv in ("q8_0", "q4_0", "q4_1", "q5_0", "q5_1",
                                   "iq4_nl", "f16"):
            rkl, rt1 = run_ref(args.ref_bin, args.gguf, corpus, base_path,
                               ref_kv, kv_v)
            ref = f"{rkl:.2e} / {rt1 * 100:.1f}%"
            if kv == "f32":
                ref += " (f16 KV)"
        else:
            ref = "—"
        print(f"| {kv} | {kv_v or kv} | {kl:.2e} / {t1 * 100:.1f}% | {ref} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
