"""Real-weights quality gate: wikitext-2 Δ-PPL + KL per quant type.

Role of the reference's `examples/perplexity/README.md:40-70` table
(Llama-3-8B: f16 6.2332, q8_0 +0.0027, q6_K +0.0217, q5_K_M +0.0570,
q4_K_M +0.1755 / +0.1513 with imatrix, q4_0 +0.4685). This environment has
zero egress — no real weights or wikitext can enter — so this script is
the STAGED pipeline: the moment a real GGUF and wikitext-2-raw are
available, one command emits the whole BASELINE table.

  python scripts/real_ppl.py --gguf /path/f16.gguf --text wiki.test.raw \
      [--imatrix-text wiki.train.raw] [--ctx 512] [--out real_ppl.json]

What it does per quant type (resumable — checkpoints after each):
  1. quantize the base GGUF with tools/quantize.py (the byte-identical-
     to-reference quantizers; q4_K_M also with an imatrix when
     --imatrix-text is given, computed by tools/imatrix.py)
  2. perplexity over the corpus at --ctx (reference chunking semantics:
     BOS-tokenized, per-chunk second-half scoring — tools/perplexity.py
     matches the reference to 0.02%, tests/test_reference_ab.py)
  3. mean KL + top-1 vs the base model's own logits (saved once)

--dry-run: prove the plumbing end-to-end on a tiny synthetic GGUF +
synthetic corpus (runs in minutes on CPU; exercises every stage incl.
imatrix collection and the q4_K_M imatrix variant).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

QUANTS = ["Q8_0", "Q6_K", "Q5_K_M", "Q4_K_M", "Q4_0"]


def _ppl(gguf: str, text: str, ctx: int) -> float:
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.tools.perplexity import compute_perplexity

    model = load_model(gguf)
    ids = model.tokenizer.encode(open(text, encoding="utf-8").read(),
                                 add_special=True)
    return compute_perplexity(model, ids, n_ctx=ctx,
                              progress=False)[0]


def _kl(gguf: str, base_logits: str) -> tuple[float, float]:
    import jax.numpy as jnp

    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.tools.perplexity import kl_divergence

    model = load_model(gguf)
    return kl_divergence(model, base_logits, compute_dtype=jnp.float32,
                         progress=False)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", help="base f16/f32 GGUF (real weights)")
    ap.add_argument("--text", help="wikitext-2-raw test file")
    ap.add_argument("--imatrix-text", help="calibration text (e.g. "
                    "wikitext-2 train slice) for the q4_K_M imatrix row")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--out", default="real_ppl.json")
    ap.add_argument("--quants", default=",".join(QUANTS))
    ap.add_argument("--dry-run", action="store_true",
                    help="tiny synth GGUF + corpus through the full "
                         "pipeline (plumbing proof, no real weights)")
    args = ap.parse_args()

    from llama_cpp_dsp_tpu.utils.jax_setup import setup_jax

    setup_jax(platform="cpu" if args.dry_run else None)

    if args.dry_run:
        sys.path.insert(0, "tests")
        import random

        from model_builder import build_tiny_llama

        from llama_cpp_dsp_tpu.gguf.constants import GGMLType

        args.gguf = "/tmp/real_ppl_base.gguf"
        build_tiny_llama(args.gguf, qtype=GGMLType.F32, n_embd=256, n_ff=512)
        rng = random.Random(7)
        words = ["the", "fox", "jumps", "over", "lazy", "dog", "runs", "far"]
        args.text = "/tmp/real_ppl_corpus.txt"
        with open(args.text, "w") as f:
            f.write(" ".join(rng.choice(words) for _ in range(400)))
        args.imatrix_text = args.text
        args.ctx = 64
        args.out = "/tmp/real_ppl_dryrun.json"
    elif not (args.gguf and args.text):
        ap.error("--gguf and --text are required (or --dry-run)")

    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    def record(key, val):
        results[key] = val
        print(f"== {key}: {json.dumps(val)}", file=sys.stderr, flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    workdir = os.path.dirname(os.path.abspath(args.out)) or "."
    base_logits = os.path.join(workdir, "real_ppl_base_logits.npz")

    # 1) base PPL + base logits (the KL anchor)
    if "base" not in results:
        t0 = time.time()
        ppl = _ppl(args.gguf, args.text, args.ctx)
        record("base", {"gguf": args.gguf, "ppl": round(ppl, 4),
                        "secs": round(time.time() - t0, 1)})
    if not os.path.exists(base_logits):
        from llama_cpp_dsp_tpu.runtime.loader import load_model
        from llama_cpp_dsp_tpu.tools.perplexity import save_logits

        model = load_model(args.gguf)
        ids = model.tokenizer.encode(open(args.text, encoding="utf-8").read(),
                                     add_special=True)
        save_logits(model, ids, base_logits, n_ctx=args.ctx)
        print(f"base logits -> {base_logits}", file=sys.stderr)

    # 2) optional imatrix for the weighted q4_K_M row
    imatrix_path = None
    if args.imatrix_text:
        imatrix_path = os.path.join(workdir, "real_ppl.imatrix")
        if not os.path.exists(imatrix_path):
            from llama_cpp_dsp_tpu.tools import imatrix as imt

            rc = imt.main(["-m", args.gguf, "-f", args.imatrix_text,
                           "-o", imatrix_path,
                           "--chunk-size", str(args.ctx)])
            assert rc == 0, "imatrix collection failed"

    # 3) per-quant: quantize → PPL → KL
    from llama_cpp_dsp_tpu.tools import quantize as q

    base_ppl = results["base"]["ppl"]
    todo = [(ft, None) for ft in args.quants.split(",") if ft]
    if imatrix_path and "Q4_K_M" in args.quants:
        todo.append(("Q4_K_M", imatrix_path))
    for ftype, imx in todo:
        key = f"{ftype}+imatrix" if imx else ftype
        if key in results:
            continue
        out_gguf = os.path.join(workdir, f"real_ppl_{key.replace('+', '_')}.gguf")
        t0 = time.time()
        qargs = [args.gguf, out_gguf, ftype]
        if imx:
            qargs += ["--imatrix", imx]
        assert q.main(qargs) == 0, f"quantize {key} failed"
        ppl = _ppl(out_gguf, args.text, args.ctx)
        kl, top1 = _kl(out_gguf, base_logits)
        record(key, {
            "size_gib": round(os.path.getsize(out_gguf) / 2**30, 3),
            "ppl": round(ppl, 4),
            "delta_ppl": round(ppl - base_ppl, 4),
            "kl_vs_base": round(float(kl), 6),
            "top1_agree": round(float(top1), 4),
            "secs": round(time.time() - t0, 1),
        })
        if args.dry_run:
            os.remove(out_gguf)

    # 4) BASELINE-format markdown
    print("\n| Quant | imatrix | Size (GiB) | PPL | ΔPPL vs base | KL | top-1 |")
    print("|---|---|---|---|---|---|---|")
    print(f"| base | — | — | {base_ppl:.4f} | — | 0 | 100% |")
    for ftype, imx in todo:
        key = f"{ftype}+imatrix" if imx else ftype
        r = results.get(key)
        if not r:
            continue
        print(f"| {ftype.lower()} | {'yes' if imx else 'none'} "
              f"| {r['size_gib']} | {r['ppl']:.4f} | {r['delta_ppl']:+.4f} "
              f"| {r['kl_vs_base']:.4g} | {r['top1_agree'] * 100:.1f}% |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
