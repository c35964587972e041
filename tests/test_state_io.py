"""State save/load tests — mirror of reference examples/save-load-state:
generate, save, restore into a FRESH context, continue — continuation must
match generating straight through."""

import pytest

from llama_cpp_dsp_tpu.runtime.context import LlamaContext
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.runtime.state_io import load_state, save_state

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_state.gguf"
    build_tiny_llama(str(path), qtype=8)
    return load_model(str(path))


def _ctx(model):
    return LlamaContext(model, n_ctx=64, prefill_buckets=(16,), use_pallas=False)


def test_save_restore_continuation(model, tmp_path):
    import numpy as np

    prompt = [5, 9, 2, 6]
    # straight-through reference: 10 greedy tokens
    ref = _ctx(model)
    full = list(ref.generate(prompt, max_new_tokens=10))

    # generate 5, save the session (cache holds prompt + 4 generated evals)
    c = _ctx(model)
    t = int(np.argmax(c.eval_tokens(prompt)))
    toks = [t]
    for _ in range(4):
        t = int(np.argmax(c.eval_tokens([t])))
        toks.append(t)
    assert toks == full[:5]
    save_state(c, str(tmp_path / "s2.npz"), prompt + toks[:-1])

    # restore into a FRESH context and continue from the pending last token
    d = _ctx(model)
    hist = load_state(d, str(tmp_path / "s2.npz"))
    assert hist == prompt + toks[:-1]
    assert d.n_past == c.n_past  # toks[-1] was sampled but not yet evaluated
    t = toks[-1]
    cont = []
    for _ in range(5):
        t = int(np.argmax(d.eval_tokens([t])))
        cont.append(t)
    assert toks + cont == full


def test_state_mismatch_rejected(model, tmp_path):
    a = _ctx(model)
    a.eval_tokens([1, 2, 3])
    path = str(tmp_path / "s.npz")
    save_state(a, path, [1, 2, 3])
    data_path = str(tmp_path / "bogus.npz")
    import numpy as np

    np.savez_compressed(data_path, meta="{}", k=np.zeros(1), v=np.zeros(1))
    b = _ctx(model)
    with pytest.raises(ValueError):
        load_state(b, data_path)


@pytest.mark.parametrize("engine_kw", [
    {"kv_dtype": "q8_0"},
    {"kv_layout": "paged", "page_size": 8},
    {"kv_layout": "paged", "page_size": 8, "kv_dtype": "q8_0"},
])
def test_slot_save_restore_layouts(model, tmp_path, engine_kw):
    """Slot save/restore must work for quantized and paged cache layouts
    (reference cross-type state_seq re-read, llama-kv-cache.cpp:154-198):
    restore into a poisoned slot, continuation matches the solo run."""
    from llama_cpp_dsp_tpu.runtime.engine import Engine
    from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain
    from llama_cpp_dsp_tpu.runtime.state_io import load_slot, save_slot

    def greedy():
        return SamplerChain([Greedy()])

    eng = Engine(model, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                 use_pallas=False, **engine_kw)
    prompt = [11, 7, 3, 13, 2]
    ref = eng.generate_sync(list(prompt), max_new_tokens=8, sampler=greedy())

    # prefill + 3 tokens into slot 0, save it
    r1 = eng.generate_sync(list(prompt), max_new_tokens=3, sampler=greedy())
    assert r1.result_tokens == ref.result_tokens[:3]
    slot = max(eng.slots, key=lambda s: s.n_past)
    tokens = list(prompt) + r1.result_tokens
    f = tmp_path / "slot.npz"
    save_slot(eng, slot.idx, str(f), tokens)

    # poison the slot's cache, then restore
    eng.generate_sync([99, 98, 97, 96], max_new_tokens=2, sampler=greedy())
    eng.generate_sync([89, 88, 87, 86], max_new_tokens=2, sampler=greedy())
    got_tokens = load_slot(eng, slot.idx, str(f))
    assert got_tokens == tokens
    slot.cache_tokens = got_tokens[:]

    # continue from the restored state: submit the same prefix — the engine
    # reuses the restored cache (prefix match) and must produce the tail
    r2 = eng.generate_sync(list(tokens), max_new_tokens=5, sampler=greedy())
    assert r2.result_tokens == ref.result_tokens[3:8]
