"""Server E2E tests — mirror of examples/server/tests/unit: real HTTP
requests against the app with a tiny model behind the engine."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from llama_cpp_dsp_tpu.runtime.engine import Engine
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.serve.server import Server

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def server_setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_server.gguf"
    build_tiny_llama(str(path), qtype=8)
    model = load_model(str(path))
    engine = Engine(model, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                    use_pallas=False)
    engine.start()
    server = Server(engine, model_name="tiny", api_key="secret")
    yield server
    engine.stop()


def _run(server, coro_fn):
    async def inner():
        app = server.make_app()
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await coro_fn(client)
        finally:
            await client.close()

    return asyncio.new_event_loop().run_until_complete(inner())


AUTH = {"Authorization": "Bearer secret"}


def test_health_props_models(server_setup):
    async def go(client):
        r = await client.get("/health")
        assert (await r.json())["status"] == "ok"
        r = await client.get("/props")
        props = await r.json()
        assert props["n_slots"] == 2
        r = await client.get("/v1/models")
        assert (await r.json())["data"][0]["id"] == "tiny"

    _run(server_setup, go)


def test_props_change_gated(server_setup):
    async def go(client):
        # default: POST /props is disabled (reference gates on --props)
        r = await client.post("/props", json={}, headers=AUTH)
        assert r.status == 501
        server_setup.endpoint_props = True
        try:
            r = await client.post("/props", json={}, headers=AUTH)
            assert (await r.json())["success"] is True
        finally:
            server_setup.endpoint_props = False

    _run(server_setup, go)


def test_auth_required(server_setup):
    async def go(client):
        r = await client.post("/v1/completions", json={"prompt": "x"})
        assert r.status == 401
        r = await client.post("/v1/completions",
                              json={"prompt": "x", "max_tokens": 2, "temperature": 0},
                              headers=AUTH)
        assert r.status == 200

    _run(server_setup, go)


def test_completion(server_setup):
    async def go(client):
        r = await client.post(
            "/v1/completions",
            json={"prompt": [3, 5, 7], "max_tokens": 4, "temperature": 0},
            headers=AUTH,
        )
        assert r.status == 200
        body = await r.json()
        assert body["object"] == "text_completion"
        assert body["usage"]["prompt_tokens"] == 3
        assert body["usage"]["completion_tokens"] >= 1
        assert body["choices"][0]["finish_reason"] in ("stop", "length")

    _run(server_setup, go)


def test_chat_completion(server_setup):
    async def go(client):
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4,
                "temperature": 0,
            },
            headers=AUTH,
        )
        assert r.status == 200
        body = await r.json()
        assert body["object"] == "chat.completion"
        assert body["choices"][0]["message"]["role"] == "assistant"

    _run(server_setup, go)


def test_streaming(server_setup):
    async def go(client):
        r = await client.post(
            "/v1/completions",
            json={"prompt": [4, 5], "max_tokens": 4, "temperature": 0, "stream": True},
            headers=AUTH,
        )
        assert r.status == 200
        chunks = []
        async for line in r.content:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                chunks.append(json.loads(line[6:]))
            if line == "data: [DONE]":
                break
        assert chunks
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")

    _run(server_setup, go)


def test_tokenize_round_trip(server_setup):
    async def go(client):
        r = await client.post("/tokenize", json={"content": "hello"})
        toks = (await r.json())["tokens"]
        assert toks
        r = await client.post("/detokenize", json={"tokens": toks})
        assert "content" in (await r.json())

    _run(server_setup, go)


def test_metrics_and_slots(server_setup):
    async def go(client):
        r = await client.get("/metrics")
        text = await r.text()
        assert "llamacpp:tokens_predicted_total" in text
        r = await client.get("/slots")
        slots = await r.json()
        assert len(slots) == 2

    _run(server_setup, go)


def test_parallel_requests(server_setup):
    async def go(client):
        async def one(p):
            r = await client.post(
                "/v1/completions",
                json={"prompt": p, "max_tokens": 3, "temperature": 0},
                headers=AUTH,
            )
            return await r.json()

        results = await asyncio.gather(one([1, 2]), one([8, 9]), one([3, 3, 3]))
        assert all(r["usage"]["completion_tokens"] >= 1 for r in results)

    _run(server_setup, go)


def test_embeddings_endpoint(server_setup):
    async def go(client):
        r = await client.post("/v1/embeddings",
                              json={"input": ["hello world", "goodbye"]},
                              headers=AUTH)
        assert r.status == 200
        body = await r.json()
        assert len(body["data"]) == 2
        v = body["data"][0]["embedding"]
        assert len(v) == server_setup.engine.cfg.n_embd
        assert all(isinstance(x, float) for x in v[:4])

    _run(server_setup, go)


def test_rerank_endpoint(server_setup):
    async def go(client):
        r = await client.post("/v1/rerank", json={
            "query": "hello", "documents": ["hello there", "unrelated text"],
        }, headers=AUTH)
        assert r.status == 200
        body = await r.json()
        assert len(body["results"]) == 2
        assert {"index", "relevance_score"} <= set(body["results"][0])

    _run(server_setup, go)


def test_infill_no_fim_tokens(server_setup):
    # tiny model lacks FIM tokens → clean 400, not a crash
    async def go(client):
        r = await client.post("/infill", json={
            "input_prefix": "def f(", "input_suffix": "): pass",
        }, headers=AUTH)
        assert r.status == 400

    _run(server_setup, go)


def test_slot_save_restore(server_setup, tmp_path):
    server_setup.slot_save_path = str(tmp_path)

    async def go(client):
        # generate something in slot 0 first
        r = await client.post("/v1/completions", json={
            "prompt": "ab", "max_tokens": 3, "temperature": 0.0,
        }, headers=AUTH)
        assert r.status == 200
        # filenames are basename-sanitized under --slot-save-path
        r = await client.post("/slots/0?action=save",
                              json={"filename": "../../evil/slot0.npz"},
                              headers=AUTH)
        assert r.status == 200
        import os

        assert os.path.exists(os.path.join(str(tmp_path), "slot0.npz"))
        r = await client.post("/slots/0?action=restore",
                              json={"filename": "slot0.npz"}, headers=AUTH)
        body = await r.json()
        assert r.status == 200 and body["n_restored"] >= 0
        r = await client.post("/slots/0?action=erase", json={}, headers=AUTH)
        assert r.status == 200
        # unset path → 501 not_supported (reference gate)
        server_setup.slot_save_path = None
        r = await client.post("/slots/0?action=save", json={}, headers=AUTH)
        assert r.status == 501

    _run(server_setup, go)


def test_lora_adapters_endpoint(server_setup, tmp_path):
    import numpy as np
    from llama_cpp_dsp_tpu.gguf.writer import GGUFWriter

    # minimal adapter: rank-2 on blk.0.attn_q
    w = GGUFWriter(str(tmp_path / "ad.gguf"), "llama")
    w.add_string("general.type", "adapter")
    w.add_string("adapter.type", "lora")
    w.add_float32("adapter.lora.alpha", 4.0)
    rng = np.random.default_rng(0)
    n_embd = server_setup.engine.cfg.n_embd
    w.add_tensor("blk.0.attn_q.weight.lora_a",
                 (rng.standard_normal((2, n_embd)) * 0.01).astype(np.float32))
    w.add_tensor("blk.0.attn_q.weight.lora_b",
                 (rng.standard_normal((n_embd, 2)) * 0.01).astype(np.float32))
    w.write()

    async def go(client):
        r = await client.post("/lora-adapters",
                              json=[{"path": str(tmp_path / "ad.gguf"),
                                     "scale": 0.5}], headers=AUTH)
        assert r.status == 200
        r = await client.get("/lora-adapters")
        assert (await r.json())[0]["scale"] == 0.5
        # completion still works with the adapter applied
        r = await client.post("/v1/completions", json={
            "prompt": "a", "max_tokens": 2, "temperature": 0.0}, headers=AUTH)
        assert r.status == 200
        # swap off
        r = await client.post("/lora-adapters", json=[{}], headers=AUTH)
        assert r.status == 200

    _run(server_setup, go)


def test_speculative_server(tmp_path):
    """Server-side speculative decoding (reference server.cpp:1249): SpecEngine
    behind the same HTTP API produces the target's greedy stream."""
    from llama_cpp_dsp_tpu.serve.spec_engine import SpecEngine
    from llama_cpp_dsp_tpu.runtime.engine import Request
    from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain

    path = str(tmp_path / "spec.gguf")
    build_tiny_llama(path, qtype=8)
    model = load_model(path)
    # draft == target: every draft accepted; output equals plain greedy
    eng = SpecEngine(model, model, n_ctx_per_slot=64, n_draft=4, p_min=0.0)
    eng.start()
    try:
        req = Request(0, [3, 5, 7], max_new_tokens=10,
                      sampler=SamplerChain([Greedy()]))
        eng.submit(req)
        assert req.done.wait(timeout=300)
        assert req.error is None
        assert len(req.result_tokens) == 10
        assert eng.metrics["draft_accepted_total"] > 0

        from llama_cpp_dsp_tpu.runtime.context import LlamaContext
        ctx = LlamaContext(model, n_ctx=64, use_pallas=False)
        plain = list(ctx.generate([3, 5, 7], max_new_tokens=10,
                                  stop_on_eog=False, context_shift=False))
        assert req.result_tokens == plain[: len(req.result_tokens)]
    finally:
        eng.stop()


def test_grammar_constrained_completion(server_setup):
    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": "x", "max_tokens": 6, "temperature": 0.8, "seed": 1,
            "grammar": "root ::= [0-9]+",
        }, headers=AUTH)
        assert r.status == 200
        text = (await r.json())["choices"][0]["text"]
        assert text and all(ch.isdigit() for ch in text), text

    _run(server_setup, go)


def test_apply_template_api_show_index(server_setup):
    async def go(client):
        r = await client.post("/apply-template", json={
            "messages": [{"role": "user", "content": "hi"}]}, headers=AUTH)
        assert r.status == 200
        assert "prompt" in await r.json()
        r = await client.post("/api/show", json={}, headers=AUTH)
        info = await r.json()
        assert info["model_info"]["llama.context_length"] == 64
        r = await client.get("/")
        assert r.status == 200
        assert "server" in await r.text()
        # route aliases resolve
        r = await client.post("/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 2, "temperature": 0}, headers=AUTH)
        assert r.status == 200

    _run(server_setup, go)


def test_rerank_cross_encoder(tmp_path_factory):
    """/rerank through a bert model with a cls rank head: scores come from
    the cross-encoder head, not embedding cosine."""
    from model_builder import build_tiny_bert

    path = tmp_path_factory.mktemp("models") / "tiny_bert.gguf"
    build_tiny_bert(str(path))
    model = load_model(str(path))
    engine = Engine(model, n_slots=1, n_ctx_per_slot=64,
                    prefill_buckets=(16,), use_pallas=False)
    server = Server(engine, model_name="tiny-rerank")

    async def go(client):
        r = await client.post("/v1/rerank", json={
            "query": "hello", "documents": ["aa bb", "cc dd", "ee"],
            "top_n": 2,
        })
        body = await r.json()
        assert len(body["results"]) == 2
        scores = [x["relevance_score"] for x in body["results"]]
        assert scores == sorted(scores, reverse=True)
        import math

        assert all(math.isfinite(s) for s in scores)

    _run(server, go)



def test_request_sampler_full_mapping():
    """Every reference /completion sampler knob reaches make_chain
    (server.cpp params_from_json_cmpl)."""
    from llama_cpp_dsp_tpu.serve.server import _sampler_from

    body = {"temperature": 0.6, "top_k": 7, "top_p": 0.8, "min_p": 0.1,
            "typical_p": 0.7, "mirostat": 2, "mirostat_tau": 4.0,
            "repeat_penalty": 1.2, "repeat_last_n": 32,
            "dry_multiplier": 0.6, "xtc_probability": 0.3,
            "logit_bias": [[3, -5.0], [7, 2.0]], "seed": 11}
    chain = _sampler_from(body)
    names = [type(s).__name__ for s in chain.samplers]
    assert "MirostatV2" in names
    assert "LogitBias" in names and "Dry" in names and "Penalties" in names
    body["mirostat"] = 1
    chain = _sampler_from(body)
    assert "MirostatV1" in [type(s).__name__ for s in chain.samplers]


def test_extract_reasoning():
    from llama_cpp_dsp_tpu.serve.chat import extract_reasoning

    r, c = extract_reasoning("<think>step 1\nstep 2</think>The answer is 4.")
    assert r == "step 1\nstep 2" and c == "The answer is 4."
    # template pre-opened the tag: bare leading </think>
    r, c = extract_reasoning("hmm, let me think</think>42")
    assert r == "hmm, let me think" and c == "42"
    r, c = extract_reasoning("no reasoning here")
    assert r is None and c == "no reasoning here"


def test_tool_choice_required_forces_call(tmp_path):
    """tool_choice=required: output must be a parseable tool call even on a
    random-weight model (the grammar leaves no other choice). Needs a
    roomy context: the grammar's bounded-whitespace `space` rule lets a
    random model pad every gap (~22 chars each)."""
    import json as _json

    path = str(tmp_path / "tiny.gguf")
    build_tiny_llama(path, qtype=8)
    model = load_model(path)
    engine = Engine(model, n_slots=1, n_ctx_per_slot=512,
                    prefill_buckets=(16,), use_pallas=False)
    engine.start()
    server = Server(engine, model_name="tiny")
    try:
        async def go(client):
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "weather?"}],
                "tools": [{"type": "function", "function": {
                    "name": "get_weather",
                    "parameters": {"type": "object",
                                   "properties": {"city": {"type": "string",
                                                           "maxLength": 6}},
                                   "required": ["city"],
                                   "additionalProperties": False}}}],
                "tool_choice": "required",
                "max_tokens": 400, "temperature": 0,
            })
            assert r.status == 200
            out = await r.json()
            assert out["choices"][0]["finish_reason"] == "tool_calls", out
            calls = out["choices"][0]["message"]["tool_calls"]
            assert calls[0]["function"]["name"] == "get_weather"
            args = _json.loads(calls[0]["function"]["arguments"])
            assert isinstance(args.get("city"), str)

        _run(server, go)
    finally:
        engine.stop()


def test_parse_tool_calls_extra_formats():
    """firefunction-v2, functionary v3.1/v3.2, deepseek-r1 call syntaxes
    (reference common/chat.cpp parse paths)."""
    import json as _json

    from llama_cpp_dsp_tpu.serve.chat import parse_tool_calls

    c, calls = parse_tool_calls(
        ' functools[{"name": "f", "arguments": {"x": 1}}]')
    assert c == "" and calls[0]["function"]["name"] == "f"

    c, calls = parse_tool_calls(
        'ok <function=get>{"q": "a"}</function> done')
    assert calls[0]["function"]["name"] == "get"
    assert _json.loads(calls[0]["function"]["arguments"]) == {"q": "a"}
    assert c == "ok  done"

    c, calls = parse_tool_calls('>>>all\nhello there>>>fn1\n{"a": 1}')
    assert c == "hello there" and calls[0]["function"]["name"] == "fn1"

    r1 = ("<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>"
          'lookup\n```json\n{"k": 2}\n```<｜tool▁call▁end｜>'
          "<｜tool▁calls▁end｜>")
    c, calls = parse_tool_calls(r1)
    assert calls and calls[0]["function"]["name"] == "lookup"
    assert _json.loads(calls[0]["function"]["arguments"]) == {"k": 2}

    # plain prose untouched
    c, calls = parse_tool_calls("just some text >>> not a call")
    assert calls == [] and "just some text" in c


def test_logprobs(server_setup):
    """n_probs / OpenAI logprobs: per-token top-N logprobs in responses
    (forces the host sampling path; reference server n_probs)."""
    import math

    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": "ab", "max_tokens": 3, "temperature": 0,
            "logprobs": 4,
        }, headers=AUTH)
        assert r.status == 200
        out = await r.json()
        lp = out["choices"][0]["logprobs"]
        assert lp and len(lp["content"]) >= 1
        e = lp["content"][0]
        assert e["logprob"] <= 0 and len(e["top_logprobs"]) == 4
        # greedy: the sampled token is the argmax → matches top entry
        assert math.isclose(e["logprob"], e["top_logprobs"][0]["logprob"],
                            rel_tol=1e-6)
        # chat variant with OpenAI bool + top_logprobs
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3, "temperature": 0,
            "logprobs": True, "top_logprobs": 2,
        }, headers=AUTH)
        out = await r.json()
        lp = out["choices"][0]["logprobs"]
        assert lp and len(lp["content"][0]["top_logprobs"]) == 2

    _run(server_setup, go)


def test_echo_prompt_logprobs(server_setup):
    """echo+logprobs: per-prompt-token logprobs (lm-eval loglikelihood
    pattern); the first prompt token has no context → null logprob."""
    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": "abab", "max_tokens": 1, "temperature": 0,
            "echo": True, "logprobs": 2,
        }, headers=AUTH)
        assert r.status == 200
        out = await r.json()
        lp = out["choices"][0]["logprobs"]["content"]
        n_prompt = out["usage"]["prompt_tokens"]
        assert len(lp) == n_prompt + 1  # prompt entries + 1 generated
        assert lp[0]["logprob"] is None
        assert all(e["logprob"] <= 0 for e in lp[1:])
        assert out["choices"][0]["text"]  # echo prepends the prompt

    _run(server_setup, go)


def test_stream_include_usage(server_setup):
    async def go(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3, "temperature": 0, "stream": True,
            "stream_options": {"include_usage": True},
        }, headers=AUTH)
        assert r.status == 200
        raw = (await r.read()).decode()
        chunks = [json.loads(line[6:]) for line in raw.splitlines()
                  if line.startswith("data: ") and line != "data: [DONE]"]
        assert chunks[-1]["choices"] == []
        assert chunks[-1]["usage"]["completion_tokens"] >= 1

    _run(server_setup, go)
