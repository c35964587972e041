"""Full benchmark matrix → BENCH_FULL_r{N}.json (+ markdown to stderr).

Records every BASELINE.md / batched-bench metric on the current device
(role of the reference's examples/batched-bench + llama-bench matrix,
examples/batched-bench/batched-bench.cpp:1-204):
  - decode tg64, pp512, aggregate batch-4/8 (subprocess bench.py — its
    scan mode avoids the axon memoization + dispatch-latency traps)
  - B×PP×TG matrix with p50 TTFT over reps (tools/bench_grid.run_batched)
  - MoE decode (mixtral-8x7b synth: exercises qmm_expert_rows)
  - speculative decode t/s + acceptance (draft == target: acceptance ≈ 1,
    isolates pipeline overhead — random synth weights make a smaller
    draft's acceptance meaningless)
  - paged vs contiguous KV decode, q8_0 KV decode
  - decode_chunk=8 engine throughput mode

Usage: python scripts/bench_full.py [--quick] [--only a,b,c] [--out F]
  --quick: tinyllama-synth on whatever device JAX finds (script debug)
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time

sys.path.insert(0, ".")

RESULTS: dict = {}


def _bench_py(*args: str) -> dict:
    p = subprocess.run([sys.executable, "bench.py", "--qtype", "q4_k", *args],
                       capture_output=True, text=True, timeout=7200)
    for line in p.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench.py {args}: {p.stderr[-400:]}")


def _engine_decode_rate(model, *, n_slots, pp, tg, reps=3, **engine_kw):
    """Median decode t/s + p50 TTFT over reps (engine path, host dispatch)."""
    from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
    from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain

    eng = Engine(model, n_slots=n_slots, n_ctx_per_slot=max(pp + tg + 8, 64),
                 prefill_buckets=(max(pp, 32),), **engine_kw)
    rates, ttfts, acc = [], [], []
    for rep in range(reps + 1):
        reqs = [Request(0, [1 + rep + i] * max(pp, 1), max_new_tokens=tg,
                        sampler=SamplerChain([Greedy()]))
                for i in range(n_slots)]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        while not all(r.done.is_set() for r in reqs):
            eng.step()
        t1 = time.perf_counter()
        if rep == 0:
            continue  # compile/warmup
        ttft = statistics.median(r.t_first_token - r.t_start for r in reqs)
        total_tg = sum(len(r.result_tokens) for r in reqs)
        rates.append(total_tg / max(t1 - t0 - ttft, 1e-9))
        ttfts.append(ttft * 1000)
    out = {"decode_tps": round(statistics.median(rates), 2),
           "ttft_p50_ms": round(statistics.median(ttfts), 2)}
    m = eng.metrics
    if m.get("draft_proposed_total"):
        out["spec_acceptance"] = round(
            m.get("draft_accepted_total", 0) / m["draft_proposed_total"], 3)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="BENCH_FULL_r03.json")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import os

    if os.path.exists(args.out):  # resume: keep metrics already recorded
        with open(args.out) as f:
            RESULTS.update(json.load(f))

    from llama_cpp_dsp_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax

    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.runtime.loader import LoadedModel
    from llama_cpp_dsp_tpu.tools.synth import CONFIGS, synth_params

    name = "tinyllama-1.1b" if args.quick else "llama3-8b"
    platform = jax.devices()[0].platform
    RESULTS["_meta"] = {"model": f"{name} Q4_K synth", "platform": platform,
                        "ts": time.strftime("%Y-%m-%d %H:%M:%S")}

    done_key = {"decode": "decode", "pp512": "pp512",
                "moe": "moe_decode", "ttft": "ttft_matrix",
                "paged": "paged_vs_contiguous", "chunk": "decode_chunk8",
                "q8kv": "q8_kv_decode", "q4kv": "q4_kv_decode",
                "spec": "spec_decode",
                "host_overhead": "host_overhead", "pp1024_7b": "pp1024_7b"}

    def want(key):
        if only is not None:
            return key in only
        return done_key.get(key, key) not in RESULTS  # resume skips recorded

    def want_rec(key):  # per-recorded-key resume (batch4 vs batch8 etc.)
        if only is not None:
            return key.rstrip("048") in only or key in only
        return key not in RESULTS

    def record(key, val):
        RESULTS[key] = val
        print(f"== {key}: {json.dumps(val)}", file=sys.stderr, flush=True)
        with open(args.out, "w") as f:  # checkpoint after every metric
            json.dump(RESULTS, f, indent=1)

    def run(key, thunk):
        """Record thunk() under key; a failed section must not kill the
        rest of an hours-long unattended matrix run."""
        try:
            record(key, thunk())
        except Exception as e:  # noqa: BLE001
            print(f"== {key} FAILED: {e!r}", file=sys.stderr, flush=True)
            RESULTS.setdefault("_errors", {})[key] = repr(e)[-400:]
            with open(args.out, "w") as f:
                json.dump(RESULTS, f, indent=1)

    # -- bench.py-based device-rate metrics ----------------------------------
    steps = "16" if args.quick else "64"
    if want("decode"):
        run("decode", lambda: _bench_py("--model", name, "--steps", steps))
    if want("pp512"):
        run("pp512", lambda: _bench_py("--model", name, "--pp", "512"))
    if want_rec("batch4"):
        run("batch4", lambda: _bench_py("--model", name, "--batch", "4",
                                        "--steps", "32"))
    if want_rec("batch8") and not args.quick:
        run("batch8", lambda: _bench_py("--model", name, "--batch", "8",
                                        "--steps", "32"))
    # BASELINE.md throughput rows beyond the tg128 headline
    # (examples/llama-bench/README.md:83-90): tg256 129.37, tg512 123.83,
    # 13B tg128 82.17 — longer tg rows stress growing-KV attention.
    def _baseline_row(model_name, extra, base):
        r = _bench_py("--qtype", "q4_0", "--model", model_name, *extra)
        if base:
            r["vs_baseline"] = round(r["value"] / base, 4)
        return r

    if not args.quick:
        for key, model_name, extra, base in (
                ("tg128_7b", "llama2-7b", ("--steps", "128"), 132.19),
                ("tg256_7b", "llama2-7b", ("--steps", "256"), 129.37),
                ("tg512_7b", "llama2-7b", ("--steps", "512"), 123.83),
                ("pp512_tg128_7b", "llama2-7b", ("--pp-tg", "512,128"), 0.0),
                ("tg128_13b", "llama2-13b", ("--steps", "128"), 82.17),
                ("tg512_13b", "llama2-13b", ("--steps", "512"), 78.08)):
            if want_rec(key):
                run(key, lambda m=model_name, e=extra, b=base:
                    _baseline_row(m, e, b))
    if want("pp1024_7b") and not args.quick:
        # the BASELINE pp anchor row: pp1024 @ n_batch=1024, 7B Q4_0
        # (examples/llama-bench/README.md:103, 2498.61 t/s)
        run("pp1024_7b", lambda: _bench_py("--qtype", "q4_0", "--model",
                                           "llama2-7b", "--pp", "1024"))

    def _host_overhead():
        # device-loop rate vs per-step host dispatch: the delta is the
        # host/relay cost per token for the non-chunked serving path
        scan = RESULTS.get("decode") or _bench_py("--model", name,
                                                  "--steps", steps)
        host = _bench_py("--model", name, "--steps", "32", "--no-scan")
        ms_dev = 1000.0 / scan["value"]
        ms_host = 1000.0 / host["value"]
        return {"device_ms_per_tok": round(ms_dev, 3),
                "host_path_ms_per_tok": round(ms_host, 3),
                "host_overhead_ms": round(ms_host - ms_dev, 3)}

    if want("host_overhead"):
        run("host_overhead", _host_overhead)
    if want("moe") and not args.quick:
        # mixtral-8x7b is ~29GB at Q4_K — beyond one 16GB v5e; the 8x2b
        # synth exercises the same qmm_expert_rows decode path
        run("moe_decode", lambda: _bench_py("--model", "mixtral-8x2b",
                                            "--steps", "32"))

    # -- engine-path metrics (host dispatch; the serving numbers) ------------
    cfg = CONFIGS[name]
    params = synth_params(cfg, GGMLType.Q4_K, seed=0, tie=False)
    model = LoadedModel(cfg, params, None, None, {})
    # honest per-config target where no reference bar exists: single-stream
    # decode is weight-streaming-bound, so practical SOL = weight bytes ÷
    # the measured streaming ceiling (~680 GB/s on this v5e; BASELINE.md)
    RESULTS.setdefault("_meta", {})["decode_sol_tps_at_680GBps"] = round(
        680e9 / model.n_bytes, 1)
    with open(args.out, "w") as f:
        json.dump(RESULTS, f, indent=1)

    def _ttft():
        # B×PP×TG matrix with p50 TTFT — batched-bench role
        matrix = {}
        for b in ((1, 4) if not args.quick else (1,)):
            matrix[f"B{b}_PP512_TG32"] = _engine_decode_rate(
                model, n_slots=b, pp=512, tg=32)
        return matrix

    def _paged():
        base = _engine_decode_rate(model, n_slots=4, pp=128, tg=32)
        paged = _engine_decode_rate(model, n_slots=4, pp=128, tg=32,
                                    kv_layout="paged", page_size=128)
        return {"contiguous": base, "paged": paged,
                "ratio": round(paged["decode_tps"] / base["decode_tps"], 3)}

    if want("ttft"):
        run("ttft_matrix", _ttft)
    if want("paged"):
        run("paged_vs_contiguous", _paged)
    if want("chunk"):
        run("decode_chunk8", lambda: _engine_decode_rate(
            model, n_slots=4, pp=128, tg=64, decode_chunk=8))
    if want("q8kv"):
        run("q8_kv_decode", lambda: _engine_decode_rate(
            model, n_slots=4, pp=128, tg=32, kv_dtype="q8_0"))
    if want("q4kv"):
        run("q4_kv_decode", lambda: _engine_decode_rate(
            model, n_slots=4, pp=128, tg=32, kv_dtype="q4_0"))
    if want_rec("mixed_kv_decode"):
        # split -ctk/-ctv operating point (q8 K + q4 V, MixedKVCache on
        # the XLA attention path) — records the cost of the mixed-type
        # flexibility vs the fused homogeneous caches
        run("mixed_kv_decode", lambda: _engine_decode_rate(
            model, n_slots=4, pp=128, tg=32, kv_dtype="q8_0",
            kv_v_dtype="q4_0"))
    if want("spec"):
        run("spec_decode", lambda: _engine_decode_rate(
            model, n_slots=2, pp=64, tg=32, draft_model=model, n_draft=4))

    def _spec_small_draft():
        # VERDICT r3 #2: a REAL small-draft configuration that beats plain
        # decode. Chain-synth pair (tools/synth.synth_params_chain): target
        # = 7B-shape Q4_0 whose greedy decode follows a known map, draft =
        # tinyllama-1.1b-shape with the map perturbed at ρ=0.2 → known
        # ≈0.8/token agreement exercised through the actual verify path.
        # The draft==target `spec_decode` row stays as overhead control.
        from llama_cpp_dsp_tpu.tools.synth import chain_map, synth_params_chain

        tcfg, dcfg = CONFIGS["llama2-7b"], CONFIGS["tinyllama-1.1b"]
        if args.quick:
            tcfg = CONFIGS["tinyllama-1.1b"]
        nm = chain_map(tcfg.n_vocab)
        nmd = chain_map(tcfg.n_vocab, rho=0.2)
        tgt = LoadedModel(tcfg, synth_params_chain(
            tcfg, GGMLType.Q4_0, seed=0, next_map=nm), None, None, {})
        dft = LoadedModel(dcfg, synth_params_chain(
            dcfg, GGMLType.Q4_0, seed=2, next_map=nmd), None, None, {})
        out = {"_note": "chain-synth pair: known ~0.8/token draft agreement "
                        "(rho=0.2); plain row = same target, no draft. "
                        "spec_acceptance counts accepted/PROPOSED — a "
                        "rejection discards the round's tail, so ~0.8 "
                        "per-token agreement measures ~0.5 at n_draft=6 "
                        "(geometric truncation), matching theory"}
        for b in (1, 4):
            plain = _engine_decode_rate(tgt, n_slots=b, pp=64, tg=64)
            spec = _engine_decode_rate(tgt, n_slots=b, pp=64, tg=64,
                                       draft_model=dft, n_draft=6)
            out[f"B{b}"] = {
                "plain": plain, "spec": spec,
                "speedup": round(spec["decode_tps"] / plain["decode_tps"], 3),
            }
        return out

    if want_rec("spec_decode_small_draft"):
        run("spec_decode_small_draft", _spec_small_draft)

    print(json.dumps(RESULTS, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
