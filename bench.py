"""Headline benchmark — decode tokens/s/chip, matched to BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 132.19 t/s (reference llama-bench tg128, LLaMA-7B Q4_0 on the
documented GPU config — BASELINE.md). The default workload reproduces that
exact shape: LLaMA-2-7B geometry, Q4_0 weights, tg128. Weights are
synthetic packed blocks (decode speed is weight-streaming-bound and
value-independent). `--model llama3-8b --qtype q4_k` is the harder
secondary workload tracked in CLAUDE.md/README.

Run: python bench.py [--model llama3-8b --qtype q4_k] [--steps 64]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

BASELINE_TOKS = 132.19  # examples/llama-bench/README.md:83-87 (tg128 7B Q4_0)

# per-config reference bars (examples/llama-bench/README.md:83-90,103);
# rows without a published reference number report vs_baseline 0.0 rather
# than a misleading ratio against the 7B bar (round-3 VERDICT Weak #6)
BASELINE_ROWS = {
    ("llama2-7b", "q4_0", 128): 132.19,
    ("llama2-7b", "q4_0", 256): 129.37,
    ("llama2-7b", "q4_0", 512): 123.83,
    ("llama2-13b", "q4_0", 128): 82.17,
    ("llama2-13b", "q4_0", 512): 78.08,
}
BASELINE_PP = {("llama2-7b", "q4_0", 1024): 2498.61}


def _synth_cached(args, cfg, qtype, synth_params):
    """Pickle-cache the raw synth params on disk (keyed by workload shape).

    13B materialization is ~450 s on this host's single core; same-window
    A/B protocols (CLAUDE.md) need many back-to-back bench invocations, so
    regenerating identical bytes per run dominates wall-clock. The cache
    holds PRE-conversion params — kernel layouts can depend on env gates,
    so conversion still runs per-process."""
    import os
    import pickle

    cdir = os.environ.get("LLAMA_TPU_SYNTH_CACHE", "")
    if not cdir:
        return synth_params(cfg, qtype, seed=0, tie=False)
    os.makedirs(cdir, exist_ok=True)
    key = (f"{args.model}-{args.qtype}-L{cfg.n_layers}-V{cfg.n_vocab}"
           f"-F{cfg.n_ff}-s0.pkl")
    path = os.path.join(cdir, key)
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    params = synth_params(cfg, qtype, seed=0, tie=False)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(params, f, protocol=4)
    os.replace(tmp, path)
    return params


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b")
    ap.add_argument("--qtype", default="q4_0",
                    help="weight quant type (q4_0 matches the baseline row; "
                         "q4_k for the Llama-3 Q4_K_M-style workload)")
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--n-ctx", type=int, default=0,
                    help="KV capacity (default: 256 for decode, 1024 for "
                         "--pp; static-shape flash streams the WHOLE "
                         "capacity per step, so size it to the workload "
                         "like llama-bench's n_ctx = pp+tg does)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--no-fused", action="store_true", help="disable Pallas kernels")
    ap.add_argument("--scan", dest="scan", action="store_true", default=True,
                    help="run decode steps inside one on-device loop (default; "
                         "the dev-tunnel dispatch latency is not representative)")
    ap.add_argument("--no-scan", dest="scan", action="store_false",
                    help="per-step host dispatch timing")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="write a jax.profiler trace of the timed region "
                         "(sched eval-callback/llama-bench tracing role; may "
                         "be unsupported on remote-relay platforms)")
    ap.add_argument("--pp", type=int, default=0,
                    help="measure prompt-processing throughput for one "
                         "prefill of this many tokens instead of decode")
    ap.add_argument("--pp-tg", default="",
                    help="combined row 'PP,TG' (llama-bench pp+tg mode): one "
                         "PP-token prefill then TG decode steps into the same "
                         "cache; reports (PP+TG)/total_time plus per-phase "
                         "rates — pins decode cost at realistic KV lengths")
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (two depths separate per-layer "
                         "streaming cost from fixed per-token overhead: "
                         "t(L) = fixed + L*per_layer)")
    ap.add_argument("--vocab", type=int, default=0,
                    help="override vocab size (two vocabs separate the "
                         "lm_head share of the fixed per-token cost)")
    ap.add_argument("--ffn", type=int, default=0,
                    help="override FFN width (shape-alignment ablations)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel decode over N chips with the "
                         "fused kernels (shard_map; parallel/tp_kernels)")
    args = ap.parse_args()

    # probe the device in a subprocess first: when the axon relay is down,
    # in-process jax.devices() hangs in plugin init with no way to time out
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, sys; sys.stdout.write(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=300)
        if probe.returncode != 0:
            raise RuntimeError(probe.stderr[-300:])
    except (subprocess.TimeoutExpired, RuntimeError) as e:
        print(f"bench: device unreachable ({type(e).__name__})", file=sys.stderr)
        print(json.dumps({
            "metric": "decode tokens/s/chip (device unreachable)",
            "value": 0.0, "unit": "tokens/s", "vs_baseline": 0.0,
            "error": "tpu tunnel unreachable",
        }))
        return 1

    from llama_cpp_dsp_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.models.llama import forward
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
    from llama_cpp_dsp_tpu.tools.synth import CONFIGS, synth_params

    cfg = CONFIGS[args.model]
    if args.layers or args.vocab or args.ffn:
        import dataclasses

        if args.layers:
            cfg = dataclasses.replace(cfg, n_layers=args.layers)
        if args.vocab:
            cfg = dataclasses.replace(cfg, n_vocab=args.vocab)
        if args.ffn:
            cfg = dataclasses.replace(cfg, n_ff=args.ffn)
    print(f"bench: {args.model} {args.qtype} synth, {len(jax.devices())} "
          f"device(s) [{jax.devices()[0].platform}]", file=sys.stderr)

    if not args.n_ctx:
        # llama-bench sizes n_ctx to the workload (n_prompt + n_gen); the
        # static-shape flash kernel streams the WHOLE capacity per step, so
        # a larger capacity would overstate the per-token KV traffic
        if args.pp_tg:
            need = sum(int(x) for x in args.pp_tg.split(","))
        else:
            need = args.pp or (args.steps if args.scan
                               else args.steps * 2 + args.warmup)
        args.n_ctx = max(128, -(-need // 128) * 128)

    if args.tp > 1:
        return _bench_tp(args, cfg)

    t0 = time.perf_counter()
    qtype = GGMLType[args.qtype.upper()]
    params = _synth_cached(args, cfg, qtype, synth_params)
    if not args.no_fused:
        from llama_cpp_dsp_tpu.runtime.context import convert_params_to_kernel

        params = convert_params_to_kernel(params)
    params = jax.tree.map(jnp.asarray, params)
    cache = KVCache.create(cfg.n_layers, args.batch, args.n_ctx, cfg.n_kv_heads, cfg.head_dim)
    print(f"bench: params materialized in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    use_flash = (not args.no_fused and jax.devices()[0].platform == "tpu"
                 and cfg.head_dim % 128 == 0 and args.n_ctx % 128 == 0)

    if args.pp:
        # prompt-processing throughput: time one prefill call of --pp tokens
        # (reference llama-bench pp rows; one big dispatch, latency amortized)
        @functools.partial(jax.jit, donate_argnums=(1,))
        def prefill(params, cache, tokens, positions):
            mask = causal_mask(positions, cache.capacity, 0)
            logits, cache = forward(params, cfg, tokens, positions, cache, 0,
                                    mask)
            return logits, cache

        import numpy as np

        toks = jnp.zeros((args.batch, args.pp), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(args.pp, dtype=jnp.int32)[None],
                               (args.batch, args.pp))
        logits, cache = prefill(params, cache, toks, pos)  # compile + warm
        float(np.asarray(logits[0, 0, 0]))
        best = 0.0
        for i in range(3):
            # fresh token values every run — the axon runtime memoizes
            # repeated executions with identical (executable, args)
            cache2 = KVCache.create(cfg.n_layers, args.batch, args.n_ctx,
                                    cfg.n_kv_heads, cfg.head_dim)
            t0 = time.perf_counter()
            logits, cache2 = prefill(params, cache2, toks + (i + 1), pos)
            float(np.asarray(logits[0, 0, 0]))
            best = max(best, args.pp * args.batch / (time.perf_counter() - t0))
        pp_bar = BASELINE_PP.get((args.model, args.qtype, args.pp))
        print(json.dumps({
            "metric": f"prefill tokens/s/chip ({args.model} {qtype.name}, pp{args.pp})",
            "value": round(best, 2),
            "unit": "tokens/s",
            "vs_baseline": round(best / pp_bar, 4) if pp_bar else 0.0,
        }))
        return 0

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_step(params, cache, tokens, positions, n_past):
        mask = causal_mask(positions, cache.capacity, n_past)
        logits, cache = forward(params, cfg, tokens, positions, cache, n_past,
                                mask, flash=use_flash)
        return logits, cache

    @functools.partial(jax.jit, static_argnames=("steps",), donate_argnums=(1,))
    def decode_scan(params, cache, tokens, n_past0, steps):
        """steps decode iterations in one dispatch (greedy-feedback chained):
        isolates on-chip throughput from host/relay per-step latency."""

        def body(i, carry):
            cache, toks, n_past = carry
            positions = jnp.broadcast_to(n_past[None, None], toks.shape).astype(jnp.int32)
            mask = causal_mask(positions, cache.capacity, n_past)
            logits, cache = forward(params, cfg, toks, positions, cache, n_past,
                                    mask, flash=use_flash)
            nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
            return cache, nxt, n_past + 1

        cache, toks, _ = jax.lax.fori_loop(0, steps, body, (cache, tokens, n_past0))
        return cache, toks

    if args.pp_tg:
        # llama-bench's combined pp+tg mode: one PP prefill, then TG decode
        # steps into the SAME cache — decode attention pays realistic KV
        # lengths instead of the near-empty tg-only context.
        import numpy as np

        pp_n, tg_n = (int(x) for x in args.pp_tg.split(","))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def prefill(params, cache, tokens, positions):
            mask = causal_mask(positions, cache.capacity, 0)
            return forward(params, cfg, tokens, positions, cache, 0, mask)

        toks_pp = jnp.zeros((args.batch, pp_n), jnp.int32)
        pos_pp = jnp.broadcast_to(jnp.arange(pp_n, dtype=jnp.int32)[None],
                                  (args.batch, pp_n))
        logits, cache = prefill(params, cache, toks_pp, pos_pp)  # compile
        nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        cache, toks = decode_scan(params, cache, nxt, jnp.int32(pp_n), tg_n)
        int(np.asarray(toks[0, 0]))
        best = None
        for i in range(3):
            cache2 = KVCache.create(cfg.n_layers, args.batch, args.n_ctx,
                                    cfg.n_kv_heads, cfg.head_dim)
            for leaf in jax.tree.leaves(cache2):
                float(np.asarray(leaf[(0,) * leaf.ndim]))
            tp = jnp.asarray(np.asarray(toks_pp) + i + 1)  # fresh args: the
            int(np.asarray(tp[0, 0]))  # axon runtime memoizes identical calls
            t0 = time.perf_counter()
            logits, cache2 = prefill(params, cache2, tp, pos_pp)
            float(np.asarray(logits[0, -1, 0]))
            t1 = time.perf_counter()
            nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
            cache2, toks = decode_scan(params, cache2, nxt, jnp.int32(pp_n),
                                       tg_n)
            int(np.asarray(toks[0, 0]))
            t2 = time.perf_counter()
            comb = (pp_n + tg_n) * args.batch / (t2 - t0)
            if best is None or comb > best["value"]:
                best = {"value": round(comb, 2),
                        "pp_tps": round(pp_n * args.batch / (t1 - t0), 2),
                        "tg_tps": round(tg_n * args.batch / (t2 - t1), 2)}
        print(json.dumps({
            "metric": f"pp+tg tokens/s/chip ({args.model} {qtype.name}, "
                      f"pp{pp_n}+tg{tg_n})",
            "unit": "tokens/s", "vs_baseline": 0.0,  # no GPU pp+tg row in
            **best,                                  # the reference README
        }))
        return 0

    tokens = jnp.zeros((args.batch, 1), jnp.int32)

    import numpy as np

    t0 = time.perf_counter()
    n_past = 0
    if not args.scan:  # scan mode compiles its own program on the first call
        for i in range(args.warmup):
            positions = jnp.full((args.batch, 1), n_past, jnp.int32)
            logits, cache = decode_step(params, cache, tokens, positions, jnp.int32(n_past))
            n_past += 1
        float(np.asarray(logits[0, 0, 0]))  # force execution (block_until_ready
        # can return early through remote-relay PJRT backends)
        print(f"bench: warmup ({args.warmup} steps) in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    if args.scan:
        cache, toks = decode_scan(params, cache, tokens, jnp.int32(n_past), args.steps)
        int(np.asarray(toks[0, 0]))  # compile + warm
        prof = None
        if args.profile:
            try:
                jax.profiler.start_trace(args.profile)
                prof = True
            except Exception as e:  # noqa: BLE001 — relay may not support it
                print(f"bench: profiler unavailable: {e}", file=sys.stderr)
        # timed run = llama-bench's tg test: generate steps tokens into a
        # FRESH empty context (the warm cache was donated). tokens+1 keeps
        # the args distinct — the axon runtime memoizes identical
        # (executable, args) executions.
        cache = KVCache.create(cfg.n_layers, args.batch, args.n_ctx,
                               cfg.n_kv_heads, cfg.head_dim)
        for leaf in jax.tree.leaves(cache):
            # force every zeros dispatch to FINISH before the clock starts
            # (block_until_ready can return early through the relay; an
            # element read cannot)
            float(np.asarray(leaf[(0,) * leaf.ndim]))
        toks1 = jnp.asarray(np.asarray(tokens) + 1)
        int(np.asarray(toks1[0, 0]))  # force the upload before the clock too
        t0 = time.perf_counter()
        cache, toks = decode_scan(params, cache, toks1, jnp.int32(n_past),
                                  args.steps)
        int(np.asarray(toks[0, 0]))
        dt = time.perf_counter() - t0
        if prof:
            jax.profiler.stop_trace()
            print(f"bench: trace written to {args.profile}", file=sys.stderr)
    else:
        t0 = time.perf_counter()
        for i in range(args.steps):
            positions = jnp.full((args.batch, 1), n_past, jnp.int32)
            logits, cache = decode_step(params, cache, tokens, positions, jnp.int32(n_past))
            n_past += 1
        float(np.asarray(logits[0, 0, 0]))  # forces the whole chained sequence
        dt = time.perf_counter() - t0
    toks_per_sec = args.steps * args.batch / dt

    bar = BASELINE_ROWS.get((args.model, args.qtype, args.steps))
    if args.batch != 1 or args.layers or args.vocab or args.ffn:
        bar = None  # modified shapes have no reference row
    print(json.dumps({
        "metric": f"decode tokens/s/chip ({args.model} {qtype.name}, tg{args.steps})",
        "value": round(toks_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_sec / bar, 4) if bar else 0.0,
    }))
    return 0


def _bench_tp(args, cfg) -> int:
    """Tensor-parallel decode throughput with the shard_map kernel path."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.parallel.tp_kernels import (
        make_tp_decode_step, shard_llama_kernel_params,
    )
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache
    from llama_cpp_dsp_tpu.tools.synth import synth_params

    tp = args.tp
    assert len(jax.devices()) >= tp, (len(jax.devices()), tp)
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    qtype = GGMLType[args.qtype.upper()]
    params = synth_params(cfg, qtype, seed=0, tie=False)
    stacked, specs = shard_llama_kernel_params(params, cfg, tp)
    with mesh:
        stacked = jax.tree.map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            stacked, specs)
        cache = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(
                mesh, P(None, "tp", None, None))),
            KVCache.create(cfg.n_layers, args.batch, args.n_ctx,
                           cfg.n_kv_heads, cfg.head_dim))
        step = make_tp_decode_step(cfg, mesh)(specs)
        toks = jnp.zeros((args.batch, 1), jnp.int32)
        n_past = 0
        for _ in range(args.warmup):
            logits, cache = step(stacked, cache, toks,
                                 jnp.full((args.batch, 1), n_past, jnp.int32),
                                 jnp.int32(n_past))
            n_past += 1
        float(np.asarray(logits[0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            logits, cache = step(stacked, cache, toks,
                                 jnp.full((args.batch, 1), n_past, jnp.int32),
                                 jnp.int32(n_past))
            n_past += 1
        float(np.asarray(logits[0, 0, 0]))
        dt = time.perf_counter() - t0
    tps = args.steps * args.batch / dt
    # tp runs have no published reference row at batch>1; the single-stream
    # per-config bars apply only when the workload matches a BASELINE row.
    tp_bar = (BASELINE_ROWS.get((args.model, args.qtype, args.steps))
              if args.batch == 1 else None)
    print(json.dumps({
        "metric": f"decode tokens/s ({args.model} {qtype.name}, tg{args.steps}, tp={tp})",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / tp_bar, 4) if tp_bar else 0.0,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
