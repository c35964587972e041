"""N-gram cache + lookup decoding: cache semantics, save/merge/load, and the
invariant that lookup decoding produces EXACTLY the plain greedy stream
(model-free speculation must not change outputs — reference examples/lookup).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.registry import synth_config
from llama_cpp_dsp_tpu.runtime.context import LlamaContext
from llama_cpp_dsp_tpu.runtime.loader import LoadedModel
from llama_cpp_dsp_tpu.runtime.lookup import LookupDecoder, NgramCache
from llama_cpp_dsp_tpu.tools.synth import synth_params


def test_ngram_cache_update_draft():
    c = NgramCache()
    text = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4]
    c.update(text)
    # after seeing "1 2 3 4" repeatedly, drafting from ...1,2 continues 3,4
    assert c.draft([9, 1, 2], 2) == [3, 4]
    assert c.draft([5, 6, 7], 2) == []  # unseen context drafts nothing


def test_ngram_cache_save_load_merge(tmp_path):
    a = NgramCache()
    a.update([1, 2, 3, 1, 2, 3])
    p = str(tmp_path / "ng.jsonl")
    a.save(p)
    b = NgramCache.load(p)
    assert b.draft([1, 2], 1) == [3]
    c = NgramCache()
    c.update([7, 8, 9, 7, 8, 9])
    b.merge(c)
    assert b.draft([7, 8], 1) == [9]


@pytest.fixture(scope="module")
def tiny_ctx():
    cfg = synth_config("llama", n_embd=128, n_heads=4, n_kv_heads=2,
                       head_dim=32, n_vocab=64)
    params = synth_params(cfg, GGMLType.Q8_0, seed=7, tie=False)
    model = LoadedModel(cfg, params, None, None, {})

    def make():
        return LlamaContext(model, n_ctx=128, compute_dtype=jnp.float32,
                            use_pallas=False)

    return make


def test_lookup_matches_plain_greedy(tiny_ctx):
    prompt = [3, 14, 15, 9, 26, 5, 3, 14, 15, 9]  # repetitive → drafts fire
    n_new = 24

    ctx = tiny_ctx()
    plain = []
    for t in ctx.generate(prompt, max_new_tokens=n_new, stop_on_eog=False,
                          context_shift=False):
        plain.append(t)

    ctx2 = tiny_ctx()
    dec = LookupDecoder(ctx2, n_draft=6)
    fast = list(dec.generate(prompt, max_new_tokens=n_new, stop_on_eog=False))

    assert fast == plain
    assert len(fast) == n_new
    # the synthetic model is deterministic; repetitive prompts should get at
    # least some drafts proposed
    assert dec.stats.n_drafted >= 0


def test_lookahead_matches_plain_greedy(tiny_ctx):
    from llama_cpp_dsp_tpu.runtime.lookup import LookaheadDecoder

    prompt = [3, 14, 15, 9, 26, 5, 3, 14, 15, 9]
    n_new = 20

    ctx = tiny_ctx()
    plain = list(ctx.generate(prompt, max_new_tokens=n_new, stop_on_eog=False,
                              context_shift=False))
    ctx2 = tiny_ctx()
    dec = LookaheadDecoder(ctx2, n_draft=5)
    fast = list(dec.generate(prompt, max_new_tokens=n_new, stop_on_eog=False))
    assert fast == plain


def test_lookahead_2d_matches_plain_greedy(tiny_ctx):
    """The full 2-D W×N window algorithm (lookahead.cpp) is exact: greedy
    output must be byte-identical to plain decode, with the whole batch
    (input + verification branches + window levels) in one eval_tree."""
    from llama_cpp_dsp_tpu.runtime.lookup import Lookahead2D

    prompt = [3, 14, 15, 9, 26, 5, 3, 14, 15, 9]
    n_new = 20

    ctx = tiny_ctx()
    plain = list(ctx.generate(prompt, max_new_tokens=n_new, stop_on_eog=False,
                              context_shift=False))
    ctx2 = tiny_ctx()
    dec = Lookahead2D(ctx2, w=4, n=3, g=3)
    fast = list(dec.generate(prompt, max_new_tokens=n_new, stop_on_eog=False))
    assert fast == plain
    assert len(fast) == n_new


def test_lookahead_2d_accepts_on_repetition(tiny_ctx):
    """A degenerate repeating stream must populate the n-gram pool and
    accept verification tokens (n_accepted > 0) — the speedup mechanism,
    not just correctness."""
    from llama_cpp_dsp_tpu.runtime.lookup import Lookahead2D

    # strongly periodic prompt so the window converges onto the cycle
    prompt = [7, 8, 9, 10] * 6
    ctx = tiny_ctx()
    plain = list(ctx.generate(prompt, max_new_tokens=24, stop_on_eog=False,
                              context_shift=False))
    ctx2 = tiny_ctx()
    dec = Lookahead2D(ctx2, w=4, n=3, g=3)
    fast = list(dec.generate(prompt, max_new_tokens=24, stop_on_eog=False))
    assert fast == plain
    assert dec.stats.n_accepted > 0  # verification branches actually fire
    assert dec.pool  # window harvest populated the n-gram container
