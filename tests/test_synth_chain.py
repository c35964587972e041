"""Chain-synth models (tools/synth.synth_params_chain): greedy decode
follows a KNOWN next-token map, which makes speculative-decoding
acceptance a controlled quantity for the spec bench (role of the
reference speculative example's measured acceptance,
common/speculative.cpp:24-278 — real weights are unavailable in this
environment, so agreement is constructed instead)."""

import numpy as np

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
from llama_cpp_dsp_tpu.runtime.loader import LoadedModel
from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain
from llama_cpp_dsp_tpu.tools.synth import (
    chain_map, synth_params_chain, tiny_config,
)

CFG = tiny_config(n_layers=2, n_vocab=256)
DRAFT_CFG = tiny_config(n_layers=1, n_embd=128, n_heads=4, n_kv_heads=4,
                        head_dim=32, n_ff=256, n_vocab=256)


def _model(cfg, next_map, seed=0):
    params = synth_params_chain(cfg, GGMLType.Q4_0, seed=seed,
                                next_map=next_map)
    return LoadedModel(cfg, params, None, None, {})


def _run(engine, prompts, n=24):
    reqs = [engine.submit(Request(0, list(p), max_new_tokens=n,
                                  sampler=SamplerChain([Greedy()])))
            for p in prompts]
    while not all(r.done.is_set() for r in reqs):
        engine.step()
    return [r.result_tokens for r in reqs]


def test_chain_greedy_follows_map():
    m = chain_map(CFG.n_vocab)
    eng = Engine(_model(CFG, m), n_slots=1, n_ctx_per_slot=64,
                 prefill_buckets=(8,), use_pallas=False)
    out = _run(eng, [[5]], n=16)[0]
    want, t = [], 5
    for _ in range(16):
        t = int(m[t])
        want.append(t)
    assert out == want


def test_chain_spec_acceptance_tracks_rho():
    """Draft map perturbed at ρ=0.25: verify-path acceptance should land
    near 1-ρ, and the spec stream must equal the plain stream exactly."""
    m = chain_map(CFG.n_vocab)
    md = chain_map(CFG.n_vocab, rho=0.25)
    disagree = float((m != md).mean())
    assert 0.1 < disagree < 0.4  # ρ=0.25 minus accidental agreements

    target = _model(CFG, m)
    plain = Engine(target, n_slots=1, n_ctx_per_slot=128,
                   prefill_buckets=(8,), use_pallas=False)
    want = _run(plain, [[5]], n=48)

    spec = Engine(target, n_slots=1, n_ctx_per_slot=128, prefill_buckets=(8,),
                  use_pallas=False, draft_model=_model(DRAFT_CFG, md, seed=2),
                  n_draft=4, p_min=0.0)
    got = _run(spec, [[5]], n=48)
    assert got == want
    mm = spec.metrics
    acc = mm["draft_accepted_total"] / mm["draft_proposed_total"]
    # chain positions where the maps agree accept; rho=0.25 → ~0.75 minus
    # per-round truncation effects (a rejection discards the round's tail)
    assert 0.4 < acc < 1.0, acc
