"""llama-bench + batched-bench equivalents.

Grid benchmark (reference examples/llama-bench): pp (prompt processing) and
tg (token generation) sizes × repetitions with mean ± stddev, markdown or
JSON output. Batched mode (reference examples/batched-bench): B×PP×TG
matrix reporting S_PP (prefill t/s), TTFT, S_TG (decode t/s).

Usage:
  python -m llama_cpp_dsp_tpu.tools.bench_grid -m model.gguf -p 512 -n 128
  python -m llama_cpp_dsp_tpu.tools.bench_grid --synth llama3-8b --batched \
      -npp 128,512 -ntg 128 -npl 1,4,8
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def _force(x) -> None:
    import numpy as np

    np.asarray(x).reshape(-1)[:1].sum()


def _load(args):
    import jax

    if args.synth:
        from ..gguf.constants import GGMLType
        from ..runtime.loader import LoadedModel
        from ..tools.synth import CONFIGS, synth_params

        cfg = CONFIGS[args.synth]
        params = synth_params(cfg, GGMLType[args.synth_qtype], seed=0, tie=False)
        model = LoadedModel(cfg, params, None, None, {})
        name = f"{args.synth}-synth-{args.synth_qtype}"
    else:
        from ..runtime.loader import load_model

        model = load_model(args.model)
        name = args.model
    return model, name


def run_grid(args) -> list[dict]:
    from ..runtime.context import LlamaContext

    model, name = _load(args)
    rows = []
    for pp in args.pp:
        for tg in args.tg:
            n_ctx = max(pp + tg + 8, 64)
            ctx = LlamaContext(model, n_ctx=n_ctx,
                               prefill_buckets=(pp if pp else 32,))
            samples_pp, samples_tg = [], []
            for rep in range(args.reps + 1):
                ctx.reset()
                t0 = time.perf_counter()
                if pp:
                    logits = ctx.eval_tokens([1] * pp)
                    _force(logits)
                t1 = time.perf_counter()
                for _ in range(tg):
                    logits = ctx.eval_tokens([1])
                t2 = time.perf_counter()
                _force(logits)
                t2 = time.perf_counter()
                if rep == 0:
                    continue  # warmup/compile
                if pp:
                    samples_pp.append(pp / (t1 - t0))
                if tg:
                    samples_tg.append(tg / (t2 - t1))
            if pp:
                rows.append(_row(name, f"pp{pp}", samples_pp))
            if tg:
                rows.append(_row(name, f"tg{tg}", samples_tg))
    return rows


def run_batched(args) -> list[dict]:
    from ..runtime.engine import Engine, Request
    from ..runtime.sampling import Greedy, SamplerChain

    model, name = _load(args)
    rows = []
    for npl in args.npl:
        for pp in args.pp:
            for tg in args.tg:
                n_ctx = max(pp + tg + 8, 64)
                eng = Engine(model, n_slots=npl, n_ctx_per_slot=n_ctx,
                             prefill_buckets=(pp if pp else 32,))
                # warmup round
                for _ in range(1):
                    reqs = [
                        Request(0, [1] * max(pp, 1), max_new_tokens=max(tg, 1),
                                sampler=SamplerChain([Greedy()]))
                        for _ in range(npl)
                    ]
                    for r in reqs:
                        eng.submit(r)
                    while not all(r.done.is_set() for r in reqs):
                        eng.step()
                t0 = time.perf_counter()
                reqs = [
                    Request(0, [1] * max(pp, 1), max_new_tokens=max(tg, 1),
                            sampler=SamplerChain([Greedy()]))
                    for _ in range(npl)
                ]
                for r in reqs:
                    eng.submit(r)
                while not all(r.done.is_set() for r in reqs):
                    eng.step()
                t1 = time.perf_counter()
                ttft = max(r.t_first_token - r.t_start for r in reqs)
                total_pp = npl * pp
                total_tg = sum(len(r.result_tokens) for r in reqs)
                t_total = t1 - t0
                rows.append({
                    "model": name, "B": npl, "PP": pp, "TG": tg,
                    "S_PP t/s": round(total_pp / max(ttft, 1e-9), 2),
                    "TTFT ms": round(ttft * 1000, 2),
                    "S_TG t/s": round(total_tg / max(t_total - ttft, 1e-9), 2),
                    "T s": round(t_total, 3),
                })
    return rows


def _row(model, test, samples):
    return {
        "model": model,
        "test": test,
        "t/s": round(statistics.mean(samples), 2),
        "stddev": round(statistics.stdev(samples) if len(samples) > 1 else 0.0, 2),
        "n": len(samples),
    }


def _markdown(rows: list[dict]) -> str:
    if not rows:
        return ""
    cols = list(rows[0])
    out = ["| " + " | ".join(cols) + " |", "|" + "|".join("---" for _ in cols) + "|"]
    for r in rows:
        out.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
    return "\n".join(out)


def _csv(rows: list[dict]) -> str:
    if not rows:
        return ""
    import csv as _csvmod
    import io

    buf = io.StringIO()
    w = _csvmod.DictWriter(buf, fieldnames=list(rows[0]))
    w.writeheader()
    w.writerows(rows)
    return buf.getvalue().rstrip("\n")


def _sql(rows: list[dict]) -> str:
    """INSERT statements (reference llama-bench -o sql; consumed by
    scripts/compare-llama-bench.py upstream — ours also reads the json)."""
    if not rows:
        return ""
    cols = list(rows[0])

    def q(c):
        return c.replace(" ", "_").replace("/", "_per_")

    out = ["CREATE TABLE IF NOT EXISTS test ("
           + ", ".join(f"{q(c)} TEXT" for c in cols) + ");"]
    for r in rows:
        vals = ", ".join(f"'{r[c]}'" for c in cols)
        out.append(f"INSERT INTO test ({', '.join(q(c) for c in cols)}) "
                   f"VALUES ({vals});")
    return "\n".join(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-bench", description=__doc__)
    ap.add_argument("-m", "--model")
    ap.add_argument("--synth", help="synthetic model config (e.g. llama3-8b)")
    ap.add_argument("--synth-qtype", default="Q4_K")
    ap.add_argument("-p", "--pp", default="512", help="prompt sizes, comma-sep")
    ap.add_argument("-n", "--tg", default="128", help="generation sizes, comma-sep")
    ap.add_argument("-npl", "--npl", default="1", help="batch sizes (batched mode)")
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("--batched", action="store_true")
    ap.add_argument("-o", "--output", default="md",
                    choices=["md", "json", "csv", "sql"])
    from ..utils.args import parse_with_env

    args = parse_with_env(ap, argv)
    if not args.model and not args.synth:
        ap.error("need -m or --synth")
    args.pp = [int(x) for x in str(args.pp).split(",")]
    args.tg = [int(x) for x in str(args.tg).split(",")]
    args.npl = [int(x) for x in str(args.npl).split(",")]

    from ..utils.jax_setup import setup_jax

    setup_jax()
    rows = run_batched(args) if args.batched else run_grid(args)
    if args.output == "json":
        print(json.dumps(rows, indent=2))
    elif args.output == "csv":
        print(_csv(rows))
    elif args.output == "sql":
        print(_sql(rows))
    else:
        print(_markdown(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
