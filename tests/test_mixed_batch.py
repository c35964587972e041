"""Mixed prompt+decode packed ubatch (models.llama.forward_packed) must be
numerically identical to running each slot through the standard per-slot
paths — the invariant the reference maintains by construction when
update_slots packs generating tokens and prompt chunks into one llama_decode
(examples/server/server.cpp:2847).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward, forward_packed
from llama_cpp_dsp_tpu.models.registry import synth_config
from llama_cpp_dsp_tpu.runtime.kv_cache import (
    KVCache, QuantKVCache, causal_mask, make_kv_cache,
)
from llama_cpp_dsp_tpu.tools.synth import synth_params

N_SLOTS, N_CTX = 3, 32


def _setup(arch="llama", **dims):
    cfg = synth_config(arch, **dims)
    params = synth_params(cfg, GGMLType.Q8_0, seed=3, tie=False)
    return cfg, params


def _prefill_slot(cfg, params, cache, slot, tokens):
    """Standard single-slot prefill via slot_view/merge_slot."""
    n = len(tokens)
    toks = jnp.asarray(np.asarray(tokens, np.int32)[None])
    pos = jnp.asarray(np.arange(n, dtype=np.int32)[None])
    sub = cache.slot_view(jnp.int32(slot))
    mask = causal_mask(pos, cache.capacity, 0)
    logits, sub = forward(params, cfg, toks, pos, sub, 0, mask,
                          compute_dtype=jnp.float32)
    return np.asarray(logits)[0], cache.merge_slot(sub, jnp.int32(slot))


@pytest.mark.parametrize("kv_dtype", ["f32", "q8_0"])
def test_packed_matches_sequential(kv_dtype):
    cfg, params = _setup()
    cache = make_kv_cache(cfg.n_layers, N_SLOTS, N_CTX, cfg.kv_cache_heads,
                          cfg.kv_cache_dim, kv_dtype)
    if kv_dtype == "f32" and isinstance(cache, KVCache):
        cache = KVCache(tuple(a.astype(jnp.float32) for a in cache.k),
                        tuple(a.astype(jnp.float32) for a in cache.v))
    rng = np.random.default_rng(0)
    hist0 = list(rng.integers(1, cfg.n_vocab, 5))
    hist1 = list(rng.integers(1, cfg.n_vocab, 3))
    prompt2 = list(rng.integers(1, cfg.n_vocab, 6))

    # sequential reference: prefill slots 0/1 histories
    _, cache = _prefill_slot(cfg, params, cache, 0, hist0)
    _, cache = _prefill_slot(cfg, params, cache, 1, hist1)
    ref_cache = cache

    # reference outputs for the step: decode one token on slots 0/1,
    # full prefill of slot 2's prompt
    tok0, tok1 = int(rng.integers(1, cfg.n_vocab)), int(rng.integers(1, cfg.n_vocab))

    def _decode_one(cache, slot, token, pos):
        toks = jnp.asarray([[token]], jnp.int32)
        p = jnp.asarray([[pos]], jnp.int32)
        sub = cache.slot_view(jnp.int32(slot))
        mask = causal_mask(p, cache.capacity, pos)
        logits, sub = forward(params, cfg, toks, p, sub, pos, mask,
                              compute_dtype=jnp.float32)
        return np.asarray(logits)[0, 0], cache.merge_slot(sub, jnp.int32(slot))

    ref0, ref_cache = _decode_one(ref_cache, 0, tok0, len(hist0))
    ref1, ref_cache = _decode_one(ref_cache, 1, tok1, len(hist1))
    ref2_all, ref_cache = _prefill_slot(cfg, params, ref_cache, 2, prompt2)
    ref2 = ref2_all[len(prompt2) - 1]

    # packed step: same work in ONE forward_packed call (with padding)
    P = 16
    tokens = np.zeros(P, np.int32)
    slot_ids = np.zeros(P, np.int32)
    rows = np.full(P, N_CTX, np.int32)  # capacity ⇒ dropped padding
    tokens[0], slot_ids[0], rows[0] = tok0, 0, len(hist0)
    tokens[1], slot_ids[1], rows[1] = tok1, 1, len(hist1)
    for i, t in enumerate(prompt2):
        tokens[2 + i], slot_ids[2 + i], rows[2 + i] = t, 2, i
    out_idx = np.array([0, 1, 2 + len(prompt2) - 1], np.int32)

    logits, new_cache = forward_packed(
        params, cfg, jnp.asarray(tokens), jnp.asarray(slot_ids),
        jnp.asarray(rows), cache, jnp.asarray(out_idx),
        compute_dtype=jnp.float32,
    )
    logits = np.asarray(logits)

    tol = dict(rtol=2e-4, atol=2e-4) if kv_dtype == "f32" else dict(rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(logits[0], ref0, **tol)
    np.testing.assert_allclose(logits[1], ref1, **tol)
    np.testing.assert_allclose(logits[2], ref2, **tol)

    # cache payloads must match the sequential path (written rows only)
    if isinstance(new_cache, QuantKVCache):
        got_k = np.stack([np.asarray(a) for a in new_cache.k_qs])
        want_k = np.stack([np.asarray(a) for a in ref_cache.k_qs])
    else:
        got_k = np.stack([np.asarray(a) for a in new_cache.k])
        want_k = np.stack([np.asarray(a) for a in ref_cache.k])
    for slot, n in ((0, len(hist0) + 1), (1, len(hist1) + 1), (2, len(prompt2))):
        np.testing.assert_allclose(
            got_k[:, slot, :, :n], want_k[:, slot, :, :n], rtol=2e-2, atol=2e-2,
            err_msg=f"slot {slot}",
        )


def test_packed_swa_and_softcap():
    """gemma2-style flags (SWA + logit softcap) through the packed path."""
    cfg, params = _setup("gemma2")
    cache = make_kv_cache(cfg.n_layers, N_SLOTS, N_CTX, cfg.kv_cache_heads,
                          cfg.kv_cache_dim, "f32")
    rng = np.random.default_rng(1)
    hist = list(rng.integers(1, cfg.n_vocab, 12))  # longer than swa window
    _, cache = _prefill_slot(cfg, params, cache, 0, hist)
    tok = int(rng.integers(1, cfg.n_vocab))

    toks = jnp.asarray([[tok]], jnp.int32)
    p = jnp.asarray([[len(hist)]], jnp.int32)
    sub = cache.slot_view(jnp.int32(0))
    mask = causal_mask(p, cache.capacity, len(hist))
    ref, _ = forward(params, cfg, toks, p, sub, len(hist), mask,
                     compute_dtype=jnp.float32)

    P = 8
    tokens = np.zeros(P, np.int32)
    slot_ids = np.zeros(P, np.int32)
    rows = np.full(P, N_CTX, np.int32)
    tokens[0], rows[0] = tok, len(hist)
    out_idx = np.zeros(N_SLOTS, np.int32)
    logits, _ = forward_packed(
        params, cfg, jnp.asarray(tokens), jnp.asarray(slot_ids),
        jnp.asarray(rows), cache, jnp.asarray(out_idx),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(ref)[0, 0],
                               rtol=2e-4, atol=2e-4)
