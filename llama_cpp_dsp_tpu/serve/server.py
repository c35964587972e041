"""OpenAI-compatible HTTP server with continuous batching.

Capability mirror of reference examples/server/server.cpp: /v1/completions,
/v1/chat/completions (streaming SSE + blocking), /tokenize, /detokenize,
/health, /props, /slots, /metrics (Prometheus text), API-key auth. Requests
queue into the Engine (slot-based continuous batching); an inference thread
drives the batched decode loop, mirroring the reference's queue_tasks /
update_slots split (server.cpp:1543, 2847).

Run: python -m llama_cpp_dsp_tpu.serve.server -m model.gguf --port 8080
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import sys
import time
import uuid

from aiohttp import web

from ..runtime.engine import Engine, Request
from ..runtime.sampling import make_chain

log = logging.getLogger("server")

BUILD_INFO = "llama_cpp_dsp_tpu (jax)"
SYSTEM_FINGERPRINT = "b-llama_cpp_dsp_tpu"


# ONE defaults table shared by the sampler construction (_sampler_from)
# and the generation_settings echo (_effective_settings) — two parallel
# literal tables would silently drift (round-4 review finding)
SAMPLER_DEFAULTS = {
    "seed": 0,
    "temperature": 0.8,
    "dynatemp_range": 0.0,
    "dynatemp_exponent": 1.0,
    "top_k": 40,
    "top_p": 0.95,
    "min_p": 0.05,
    "typical_p": 1.0,
    "xtc_probability": 0.0,
    "xtc_threshold": 0.1,
    "top_n_sigma": -1.0,
    "repeat_last_n": 64,
    "repeat_penalty": 1.0,
    "presence_penalty": 0.0,
    "frequency_penalty": 0.0,
    "dry_multiplier": 0.0,
    "dry_base": 1.75,
    "dry_allowed_length": 2,
    "dry_penalty_last_n": -1,
    "mirostat": 0,
    "mirostat_tau": 5.0,
    "mirostat_eta": 0.1,
}


def _effective_settings(body: dict) -> dict:
    """Effective sampler/generation settings echo (the reference's
    `generation_settings` block, examples/server/server.cpp slot params
    to_json): request values over defaults, for the implemented knobs."""
    g = body.get
    out = {k: g(k, d) for k, d in SAMPLER_DEFAULTS.items()}
    out.update({
        "n_predict": g("n_predict", g("max_tokens", -1)),
        "stop": g("stop", []),
        "n_keep": g("n_keep", 0),
        "n_discard": g("n_discard", 0),
        "ignore_eos": g("ignore_eos", False),
        "stream": bool(g("stream", False)),
        "n_probs": g("n_probs", 0),
        "grammar": g("grammar", ""),
    })
    return out


def _sampler_from(body: dict, seed_default: int = 0, tokenizer=None):
    grammar = None
    gtext = body.get("grammar")
    schema = body.get("json_schema")
    if schema is None and isinstance(body.get("response_format"), dict):
        rf = body["response_format"]
        if rf.get("type") == "json_schema":
            schema = rf.get("json_schema", {}).get("schema", rf.get("schema"))
    if schema is not None and tokenizer is not None:
        from ..grammar.json_schema import json_schema_to_gbnf

        gtext = json_schema_to_gbnf(schema)
    if gtext and tokenizer is not None:
        from ..grammar.gbnf import GrammarSampler, parse_gbnf

        grammar = GrammarSampler(parse_gbnf(gtext), tokenizer)
    # logit_bias: reference accepts [[tok, bias], ...] or {tok: bias}
    lb = body.get("logit_bias")
    if isinstance(lb, list):
        lb = {int(t): float(b) for t, b in lb}
    elif isinstance(lb, dict):
        lb = {int(t): float(b) for t, b in lb.items()}
    # "samplers": ["top_k", "infill", ...] — only the infill entry changes
    # the chain here (the default order already matches the reference's)
    use_infill = "infill" in (body.get("samplers") or [])
    d = SAMPLER_DEFAULTS

    def g(key):
        return body.get(key, d[key])

    return make_chain(
        grammar=grammar,
        infill_tokenizer=tokenizer if use_infill else None,
        seed=int(body.get("seed", seed_default) or seed_default),
        temp=float(g("temperature")),
        dynatemp_range=float(g("dynatemp_range")),
        dynatemp_exponent=float(g("dynatemp_exponent")),
        top_k=int(g("top_k")),
        top_p=float(g("top_p")),
        min_p=float(g("min_p")),
        typical_p=float(g("typical_p")),
        xtc_probability=float(g("xtc_probability")),
        xtc_threshold=float(g("xtc_threshold")),
        top_n_sigma=float(g("top_n_sigma")),
        penalty_last_n=int(g("repeat_last_n")),
        penalty_repeat=float(g("repeat_penalty")),
        penalty_freq=float(g("frequency_penalty")),
        penalty_present=float(g("presence_penalty")),
        dry_multiplier=float(g("dry_multiplier")),
        mirostat=int(g("mirostat")),
        mirostat_tau=float(g("mirostat_tau")),
        mirostat_eta=float(g("mirostat_eta")),
        logit_bias=lb,
    )


class Server:
    def __init__(self, engine: Engine, *, model_name: str = "model",
                 api_key: str | None = None,
                 chat_template: str | None = None,
                 reasoning_format: str = "auto",
                 slot_save_path: str | None = None,
                 endpoint_props: bool = False):
        self.engine = engine
        self.model_name = model_name
        self.api_key = api_key
        # --chat-template NAME/text overrides the model's embedded template
        self.chat_template = chat_template
        # auto: extract <think>...</think> into reasoning_content
        # (reference --reasoning-format deepseek); none: leave inline
        self.reasoning_format = reasoning_format
        self.slot_save_path = slot_save_path
        # POST /props is opt-in via --props (reference server.cpp
        # handle_props_change gates on params_base.endpoint_props)
        self.endpoint_props = endpoint_props
        self.t_start = time.time()

    @property
    def _template(self) -> str | None:
        return self.chat_template or self.engine.vocab.chat_template

    # -- auth -----------------------------------------------------------------
    def _check_auth(self, request: web.Request) -> bool:
        if not self.api_key:
            return True
        auth = request.headers.get("Authorization", "")
        return auth == f"Bearer {self.api_key}"

    def _deny(self) -> web.Response:
        return web.json_response({"error": {"message": "invalid api key",
                                            "type": "authentication_error"}}, status=401)

    # -- endpoints ------------------------------------------------------------
    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def props(self, request: web.Request) -> web.Response:
        cfg = self.engine.cfg
        tok = self.engine.tokenizer
        vocab = self.engine.vocab

        def piece(tid):
            if tok is None or tid is None or tid < 0:
                return ""
            return tok.token_to_piece(int(tid), special=True).decode(
                "utf-8", errors="replace")

        return web.json_response({
            "model": self.model_name,
            "model_path": getattr(vocab, "path", None) or self.model_name,
            "n_ctx": self.engine.n_ctx,
            "n_slots": self.engine.n_slots,
            "total_slots": self.engine.n_slots,  # reference /props key
            "arch": cfg.arch,
            "n_params_layers": cfg.n_layers,
            "chat_template": self._template or "",
            "bos_token": piece(getattr(vocab, "bos_id", -1) if vocab else -1),
            "eos_token": piece(getattr(vocab, "eos_id", -1) if vocab else -1),
            "build_info": BUILD_INFO,
            "default_generation_settings": {
                "id_slot": -1, "n_ctx": self.engine.n_ctx,
                "params": _effective_settings({}),
            },
        })

    async def props_change(self, request: web.Request) -> web.Response:
        """POST /props — change global properties at runtime (reference
        server.cpp handle_props_change: gated behind --props; the update
        set is currently empty upstream too, so this validates and acks)."""
        if not self.endpoint_props:
            return web.json_response(
                {"error": {"message": "This server does not support changing"
                                      " global properties. Start it with"
                                      " `--props`",
                           "type": "not_supported_error"}}, status=501)
        await request.json()  # must be valid JSON
        return web.json_response({"success": True})

    async def apply_template(self, request: web.Request) -> web.Response:
        """POST /apply-template — render the chat template without running
        inference (reference server.cpp handle_apply_template)."""
        from ..serve.chat import apply_chat_template

        body = await request.json()
        text = apply_chat_template(
            self._template, body.get("messages", []),
        )
        return web.json_response({"prompt": text})

    async def api_show(self, request: web.Request) -> web.Response:
        """POST /api/show — ollama-compatible model info (reference
        server.cpp handle_api_show)."""
        return web.json_response({
            "template": self._template or "",
            "model_info": {"llama.context_length": self.engine.n_ctx},
        })

    async def index(self, request: web.Request) -> web.Response:
        return web.Response(
            text="<html><body><h1>llama_cpp_dsp_tpu server</h1>"
                 "<p>OpenAI-compatible API: POST /v1/chat/completions, "
                 "/v1/completions, /v1/embeddings. Native: /completion, "
                 "/infill, /rerank, /tokenize, /props, /slots, /metrics."
                 "</p></body></html>",
            content_type="text/html")

    async def models(self, request: web.Request) -> web.Response:
        cfg = self.engine.cfg
        n_params = n_bytes = 0
        try:
            from ..runtime.loader import LoadedModel

            if isinstance(self.engine.model, LoadedModel):
                n_params = self.engine.model.n_params
                n_bytes = self.engine.model.n_bytes
        except Exception:  # noqa: BLE001
            pass
        vocab = self.engine.vocab
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model", "created": int(self.t_start),
                      "owned_by": "llama_cpp_dsp_tpu",
                      # reference /v1/models meta block (server.cpp
                      # handle_models: model hparams summary)
                      "meta": {
                          "vocab_type": str(getattr(vocab, "vocab_type", "")
                                            or "none"),
                          "n_vocab": cfg.n_vocab,
                          "n_ctx_train": cfg.n_ctx_train,
                          "n_embd": cfg.n_embd,
                          "n_params": n_params,
                          "size": n_bytes,
                      }}],
        })

    async def slots(self, request: web.Request) -> web.Response:
        return web.json_response([
            {
                "id": s.idx,
                "state": s.state.value,
                "n_past": s.n_past,
                "rid": s.req.rid if s.req else None,
            }
            for s in self.engine.slots
        ])

    async def metrics(self, request: web.Request) -> web.Response:
        m = self.engine.metrics
        lines = [
            "# TYPE llamacpp:prompt_tokens_total counter",
            f"llamacpp:prompt_tokens_total {m['prompt_tokens_total']}",
            "# TYPE llamacpp:tokens_predicted_total counter",
            f"llamacpp:tokens_predicted_total {m['tokens_predicted_total']}",
            "# TYPE llamacpp:requests_total counter",
            f"llamacpp:requests_total {m['n_requests']}",
            "# TYPE llamacpp:errors_total counter",
            f"llamacpp:errors_total {m['n_errors']}",
            "# TYPE llamacpp:kv_cache_usage_ratio gauge",
            f"llamacpp:kv_cache_usage_ratio {self.engine.n_busy_slots / self.engine.n_slots}",
        ]
        return web.Response(text="\n".join(lines) + "\n", content_type="text/plain")

    async def tokenize(self, request: web.Request) -> web.Response:
        body = await request.json()
        ids = self.engine.tokenizer.encode(
            body.get("content", ""),
            add_special=bool(body.get("add_special", False)),
            parse_special=bool(body.get("with_pieces", False)) or True,
        )
        return web.json_response({"tokens": ids})

    async def detokenize(self, request: web.Request) -> web.Response:
        body = await request.json()
        text = self.engine.tokenizer.decode([int(t) for t in body.get("tokens", [])])
        return web.json_response({"content": text})

    # -- embeddings / rerank / infill (reference server.cpp handlers) -------
    async def embeddings(self, request: web.Request) -> web.Response:
        if not self._check_auth(request):
            return self._deny()
        body = await request.json()
        inputs = body.get("input", body.get("content", ""))
        if isinstance(inputs, str):
            inputs = [inputs]
        loop = asyncio.get_running_loop()
        data = []
        for i, text in enumerate(inputs):
            ids = self.engine.tokenizer.encode(text, add_special=True,
                                               parse_special=True)
            vec = await loop.run_in_executor(None, self.engine.embed, ids)
            data.append({"object": "embedding", "index": i,
                         "embedding": [float(x) for x in vec]})
        return web.json_response({
            "object": "list", "data": data, "model": self.model_name,
            "usage": {"prompt_tokens": 0, "total_tokens": 0},
        })

    async def rerank(self, request: web.Request) -> web.Response:
        """Reranker: cross-encoder scoring through the model's rank head
        (cls/cls.output tensors — reference pooling_type RANK + server
        format_rerank pairing); cosine over pooled embeddings when the
        model carries no head."""
        if not self._check_auth(request):
            return self._deny()
        body = await request.json()
        query = body.get("query", "")
        docs = body.get("documents", [])
        loop = asyncio.get_running_loop()

        if getattr(self.engine, "has_rank_head", False):
            vocab = self.engine.vocab
            tok = self.engine.tokenizer

            def _pair_ids(doc: str) -> list[int]:
                # reference format_rerank: bos query eos sep doc eos
                null = -1
                bos = [vocab.bos_id] if getattr(vocab, "bos_id", null) >= 0 else []
                eos = [vocab.eos_id] if getattr(vocab, "eos_id", null) >= 0 else []
                sep = [vocab.sep_id] if getattr(vocab, "sep_id", null) >= 0 else eos
                return (bos + tok.encode(query, add_special=False) + eos + sep
                        + tok.encode(doc, add_special=False) + eos)

            results = []
            for i, doc in enumerate(docs):
                score = await loop.run_in_executor(
                    None, self.engine.rank, _pair_ids(doc))
                results.append({"index": i, "relevance_score": score})
            results.sort(key=lambda r: -r["relevance_score"])
            top_n = int(body.get("top_n", len(results)))
            return web.json_response({"model": self.model_name,
                                      "results": results[:top_n]})

        def emb(text):
            ids = self.engine.tokenizer.encode(text, add_special=True,
                                               parse_special=True)
            v = self.engine.embed(ids)
            import numpy as _np

            return v / (_np.linalg.norm(v) + 1e-8)

        qv = await loop.run_in_executor(None, emb, query)
        results = []
        for i, doc in enumerate(docs):
            dv = await loop.run_in_executor(None, emb, doc)
            results.append({"index": i, "relevance_score": float(qv @ dv)})
        results.sort(key=lambda r: -r["relevance_score"])
        top_n = int(body.get("top_n", len(results)))
        return web.json_response({"model": self.model_name,
                                  "results": results[:top_n]})

    async def infill(self, request: web.Request) -> web.StreamResponse:
        """FIM completion — reference /infill (fim_pre/suf/mid tokens)."""
        if not self._check_auth(request):
            return self._deny()
        body = await request.json()
        vocab = self.engine.vocab
        pre_id = getattr(vocab, "fim_pre_id", -1)
        suf_id = getattr(vocab, "fim_suf_id", -1)
        mid_id = getattr(vocab, "fim_mid_id", -1)
        if min(pre_id, suf_id, mid_id) < 0:
            return web.json_response(
                {"error": {"message": "model lacks FIM tokens"}}, status=400)
        tok = self.engine.tokenizer
        ids = (
            [pre_id] + tok.encode(body.get("input_prefix", ""), add_special=False)
            + [suf_id] + tok.encode(body.get("input_suffix", ""), add_special=False)
            + [mid_id]
        )
        return await self._run(request, body, ids, chat=False)

    async def slot_action(self, request: web.Request) -> web.Response:
        """Slot save/restore/erase — reference server.cpp:3769-3828.
        save/restore require --slot-save-path (reference gate); filenames
        are basename-sanitized and joined under that directory."""
        if not self._check_auth(request):
            return self._deny()
        import os as _os

        from ..runtime.state_io import load_slot, save_slot

        slot_id = int(request.match_info["slot_id"])
        action = request.query.get("action", "")
        body = await request.json() if request.can_read_body else {}
        if action in ("save", "restore"):
            if not self.slot_save_path:
                return web.json_response(
                    {"error": {"message": "start the server with "
                               "--slot-save-path to enable slot save/restore",
                               "type": "not_supported_error"}}, status=501)
            raw = body.get("filename", f"slot_{slot_id}.bin")
            filename = _os.path.join(self.slot_save_path,
                                     _os.path.basename(str(raw)))
        if slot_id < 0 or slot_id >= self.engine.n_slots:
            return web.json_response({"error": {"message": "bad slot"}}, status=400)
        slot = self.engine.slots[slot_id]
        if action == "save":
            tokens = slot.req.prompt_tokens if slot.req else []
            save_slot(self.engine, slot_id, filename, tokens=tokens)
            return web.json_response({"id_slot": slot_id, "filename": filename,
                                      "n_saved": slot.n_past})
        if action == "restore":
            load_slot(self.engine, slot_id, filename)
            return web.json_response({"id_slot": slot_id, "filename": filename,
                                      "n_restored": slot.n_past})
        if action == "erase":
            slot.n_past = 0
            slot.state = slot.state.__class__.FREE
            return web.json_response({"id_slot": slot_id, "n_erased": 1})
        return web.json_response({"error": {"message": "unknown action"}}, status=400)

    async def lora_adapters_get(self, request: web.Request) -> web.Response:
        return web.json_response(getattr(self, "_loras", []))

    async def lora_adapters_post(self, request: web.Request) -> web.Response:
        """Hot-swap LoRA scale — reference POST /lora-adapters."""
        if not self._check_auth(request):
            return self._deny()
        body = await request.json()
        from ..runtime.adapter import load_lora

        loop = asyncio.get_running_loop()
        applied = []
        for entry in body if isinstance(body, list) else [body]:
            path = entry.get("path")
            scale = float(entry.get("scale", 1.0))
            if path:
                adapter = await loop.run_in_executor(None, load_lora, path)
                await loop.run_in_executor(
                    None, self.engine.set_lora, adapter, scale)
                applied.append({"path": path, "scale": scale})
            else:
                await loop.run_in_executor(None, self.engine.set_lora, None)
        self._loras = applied
        return web.json_response(applied)

    # -- completion core --------------------------------------------------------
    def _make_request(self, prompt_ids, body, stream_q: asyncio.Queue | None,
                      loop) -> Request:
        stop = body.get("stop") or []
        if isinstance(stop, str):
            stop = [stop]
        max_tokens = int(body.get("max_tokens") or body.get("n_predict") or 128)

        cb = None
        if stream_q is not None:
            def cb(rid, ev):
                loop.call_soon_threadsafe(stream_q.put_nowait, ev)

        # n_probs (native) / logprobs+top_logprobs (OpenAI): top-N
        # per-token logprobs; forces the host sampling path
        n_probs = int(body.get("n_probs") or 0)
        if not n_probs and body.get("logprobs"):
            lp = body["logprobs"]
            n_probs = (int(body.get("top_logprobs") or 1)
                       if isinstance(lp, bool) else int(lp))
        return Request(
            0,
            list(prompt_ids),
            max_new_tokens=max_tokens,
            sampler=_sampler_from(body, tokenizer=self.engine.tokenizer),
            stop_strings=list(stop),
            stream_cb=cb,
            n_probs=n_probs,
            echo=bool(body.get("echo", False)),
        )

    async def completions(self, request: web.Request) -> web.StreamResponse:
        if not self._check_auth(request):
            return self._deny()
        body = await request.json()
        prompt = body.get("prompt", "")
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            ids = [int(t) for t in prompt]
        else:
            if isinstance(prompt, list):
                prompt = "".join(prompt)
            ids = self.engine.tokenizer.encode(prompt, add_special=True, parse_special=True)
        # /completion and /completions use the reference server's NATIVE
        # response schema; only /v1/completions is OpenAI-shaped
        # (examples/server/server.cpp routes)
        native = not request.path.startswith("/v1/")
        return await self._run(request, body, ids, chat=False, native=native)

    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        if not self._check_auth(request):
            return self._deny()
        body = await request.json()
        from ..serve.chat import apply_chat_template

        text = apply_chat_template(
            self._template, body.get("messages", []),
            add_generation_prompt=True, bos_token="", eos_token="",
            tools=body.get("tools"),
        )
        ids = self.engine.tokenizer.encode(text, add_special=True, parse_special=True)
        # tool_choice "required" / named function forces a tool-call
        # grammar over the bare-JSON call format (reference common/chat.cpp
        # builds per-format grammars; parse_tool_calls handles this form)
        choice = body.get("tool_choice")
        tools = body.get("tools") or []
        if (tools and choice not in (None, "none", "auto")
                and not body.get("grammar") and not body.get("json_schema")):
            fns = [t["function"] for t in tools if t.get("type") == "function"]
            if isinstance(choice, dict):
                want = choice.get("function", {}).get("name")
                fns = [f for f in fns if f.get("name") == want]
            if fns:
                body = dict(body)
                body["json_schema"] = {"anyOf": [
                    {"type": "object",
                     "properties": {
                         "name": {"const": f["name"]},
                         "arguments": f.get("parameters", {"type": "object"}),
                     },
                     "required": ["name", "arguments"],
                     "additionalProperties": False}
                    for f in fns]}
        return await self._run(request, body, ids, chat=True)

    def _native_payload(self, req, body, text, timings) -> dict:
        """Reference native /completion response (server.cpp
        server_task_result_cmpl_final::to_json_non_oaicompat)."""
        pn, dn = req.n_prompt, len(req.result_tokens)
        pms = max(timings["prompt_ms"], 0.0)
        dms = max(timings["predicted_ms"], 0.0)
        if req.stop_reason == "length":
            stop_type = "limit"
        elif req.stop_reason == "stop":
            stop_type = "word" if req.stop_word else "eos"
        else:
            stop_type = "none"  # error / cancelled / still running
        return {
            "index": 0,
            "content": text,
            "tokens": list(req.result_tokens),
            "id_slot": -1,
            "stop": True,
            "model": self.model_name,
            "tokens_predicted": dn,
            "tokens_evaluated": pn,
            "generation_settings": _effective_settings(body),
            "prompt": self.engine.tokenizer.decode(req.prompt_tokens),
            "has_new_line": text.endswith("\n"),
            "truncated": False,
            "stop_type": stop_type,
            "stopping_word": req.stop_word,
            "tokens_cached": pn + dn - 1,
            "timings": {
                "prompt_n": pn,
                "prompt_ms": pms,
                "prompt_per_token_ms": round(pms / max(pn, 1), 3),
                "prompt_per_second": round(pn / pms * 1000, 2) if pms else 0.0,
                "predicted_n": dn,
                "predicted_ms": dms,
                "predicted_per_token_ms": round(dms / max(dn, 1), 3),
                "predicted_per_second": (round(dn / dms * 1000, 2)
                                         if dms else 0.0),
            },
        }

    async def _run(self, request, body, ids, *, chat: bool,
                   native: bool = False) -> web.StreamResponse:
        loop = asyncio.get_running_loop()
        stream = bool(body.get("stream", False))
        rid = f"chatcmpl-{uuid.uuid4().hex[:12]}" if chat else f"cmpl-{uuid.uuid4().hex[:12]}"
        created = int(time.time())
        obj = "chat.completion" if chat else "text_completion"

        if stream:
            q: asyncio.Queue = asyncio.Queue()
            req = self._make_request(ids, body, q, loop)
            self.engine.submit(req)
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            })
            await resp.prepare(request)
            while True:
                try:
                    ev = await q.get()
                except asyncio.CancelledError:
                    self.engine.cancel(req.rid)
                    raise
                # OpenAI stream schema: usage is null on every chunk except
                # the final one (clients detect "the usage chunk" by
                # usage != null; a running total would be double-counted)
                usage_now = None
                if ev["finished"]:
                    usage_now = {
                        "prompt_tokens": req.n_prompt,
                        "completion_tokens": len(req.result_tokens),
                        "total_tokens": req.n_prompt + len(req.result_tokens),
                    }
                if chat:
                    delta = {"content": ev["piece"]} if ev["piece"] else {}
                    chunk = {
                        "id": rid, "object": "chat.completion.chunk", "created": created,
                        "model": self.model_name,
                        "system_fingerprint": SYSTEM_FINGERPRINT,
                        "choices": [{"index": 0, "delta": delta,
                                     "finish_reason": ev["finished"]}],
                        "usage": usage_now,
                    }
                elif native:
                    # reference native stream chunks (to_json_partial):
                    # per-piece {content, tokens, stop:false}; the final
                    # chunk is the full native payload with stop:true
                    if ev["finished"] in ("error", "cancelled"):
                        # surface the failure explicitly — a success-shaped
                        # stop:true payload would be indistinguishable from
                        # a normal completion
                        chunk = {"index": 0, "content": "", "tokens": [],
                                 "stop": True,
                                 "error": req.error or ev["finished"]}
                    elif ev["finished"]:
                        text = self.engine.tokenizer.decode(req.result_tokens)
                        timings = {
                            "prompt_ms": round(
                                (req.t_first_token - req.t_start) * 1000, 2),
                            "predicted_ms": round(
                                (req.t_end - req.t_first_token) * 1000, 2),
                        }
                        chunk = self._native_payload(req, body, text, timings)
                    else:
                        chunk = {"index": 0, "content": ev["piece"],
                                 "tokens": ([ev["token"]] if ev["piece"]
                                            else []),
                                 "stop": False}
                else:
                    chunk = {
                        "id": rid, "object": obj, "created": created,
                        "model": self.model_name,
                        "system_fingerprint": SYSTEM_FINGERPRINT,
                        "choices": [{"index": 0, "text": ev["piece"],
                                     "finish_reason": ev["finished"]}],
                        "usage": usage_now,
                    }
                try:
                    await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
                except (ConnectionResetError, asyncio.CancelledError):
                    self.engine.cancel(req.rid)
                    raise
                if ev["finished"]:
                    break
            if native:  # native stream ends on the stop:true payload
                await resp.write_eof()
                return resp
            # OpenAI stream_options.include_usage: a final chunk with empty
            # choices carrying the usage totals
            opts = body.get("stream_options") or {}
            if opts.get("include_usage"):
                usage_chunk = {
                    "id": rid, "object": obj + (".chunk" if chat else ""),
                    "created": created, "model": self.model_name,
                    "choices": [],
                    "usage": {
                        "prompt_tokens": req.n_prompt,
                        "completion_tokens": len(req.result_tokens),
                        "total_tokens": req.n_prompt + len(req.result_tokens),
                    },
                }
                await resp.write(
                    f"data: {json.dumps(usage_chunk)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        req = self._make_request(ids, body, None, loop)
        self.engine.submit(req)
        await loop.run_in_executor(None, req.done.wait)
        if req.error:
            status = getattr(req, "error_status", 400)
            return web.json_response(
                {"error": {"message": req.error,
                           "type": ("server_error" if status >= 500
                                    else "invalid_request_error")}},
                status=status)
        text = self.engine.tokenizer.decode(req.result_tokens)
        if req.echo and not chat:
            text = self.engine.tokenizer.decode(req.prompt_tokens) + text
        usage = {
            "prompt_tokens": req.n_prompt,
            "completion_tokens": len(req.result_tokens),
            "total_tokens": req.n_prompt + len(req.result_tokens),
        }
        timings = {
            "prompt_ms": round((req.t_first_token - req.t_start) * 1000, 2),
            "predicted_ms": round((req.t_end - req.t_first_token) * 1000, 2),
        }
        lp_obj = None
        if req.n_probs and (req.result_logprobs or req.prompt_logprobs):
            dec = (lambda i: self.engine.tokenizer.token_to_piece(
                       i, special=False).decode("utf-8", errors="replace")
                   ) if self.engine.tokenizer is not None else str

            def fmt(e, tok_id=None):
                if e is None:  # first prompt token: no context
                    return {"token": dec(tok_id), "logprob": None,
                            "top_logprobs": []}
                return {"token": dec(e["token"]), "logprob": e["logprob"],
                        "top_logprobs": [{"token": dec(i), "logprob": p}
                                         for i, p in e["top"]]}

            entries = []
            if req.echo:  # prompt logprobs first (OpenAI echo+logprobs)
                entries = [fmt(e, req.prompt_tokens[0])
                           for e in req.prompt_logprobs]
            entries += [fmt(e) for e in req.result_logprobs]
            lp_obj = {"content": entries}
        if chat:
            from ..serve.chat import extract_reasoning, parse_tool_calls

            reasoning = None
            if self.reasoning_format != "none":
                reasoning, text = extract_reasoning(text)
            content, tool_calls = parse_tool_calls(text)
            message = {"role": "assistant", "content": content or None}
            if reasoning:
                message["reasoning_content"] = reasoning
            finish = req.stop_reason
            if tool_calls:
                message["tool_calls"] = tool_calls
                finish = "tool_calls"
            payload = {
                "id": rid, "object": "chat.completion", "created": created,
                "model": self.model_name,
                "system_fingerprint": SYSTEM_FINGERPRINT,
                "choices": [{"index": 0, "message": message,
                             "logprobs": lp_obj,
                             "finish_reason": finish}],
                "usage": usage, "timings": timings,
            }
        elif native:
            payload = self._native_payload(req, body, text, timings)
            if lp_obj is not None:
                payload["completion_probabilities"] = lp_obj["content"]
        else:
            payload = {
                "id": rid, "object": obj, "created": created, "model": self.model_name,
                "system_fingerprint": SYSTEM_FINGERPRINT,
                "choices": [{"index": 0, "text": text,
                             "logprobs": lp_obj,
                             "finish_reason": req.stop_reason}],
                "usage": usage, "timings": timings,
            }
        return web.json_response(payload)

    # -- app ------------------------------------------------------------------
    def make_app(self) -> web.Application:
        @web.middleware
        async def error_middleware(request, handler):
            try:
                return await handler(request)
            except json.JSONDecodeError:
                return web.json_response(
                    {"error": {"message": "invalid JSON body",
                               "type": "invalid_request_error"}},
                    status=400,
                )
            except web.HTTPException:
                raise
            except Exception as e:  # pragma: no cover — defensive
                log.exception("handler error")
                return web.json_response(
                    {"error": {"message": str(e), "type": "server_error"}}, status=500
                )

        app = web.Application(middlewares=[error_middleware])
        app.router.add_get("/health", self.health)
        app.router.add_get("/v1/health", self.health)
        app.router.add_get("/models", self.models)
        app.router.add_get("/props", self.props)
        app.router.add_post("/props", self.props_change)
        app.router.add_get("/v1/models", self.models)
        app.router.add_get("/slots", self.slots)
        app.router.add_get("/metrics", self.metrics)
        app.router.add_post("/tokenize", self.tokenize)
        app.router.add_post("/detokenize", self.detokenize)
        app.router.add_post("/completion", self.completions)
        app.router.add_post("/completions", self.completions)
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_post("/chat/completions", self.chat_completions)
        app.router.add_post("/v1/embeddings", self.embeddings)
        app.router.add_post("/embedding", self.embeddings)
        app.router.add_post("/embeddings", self.embeddings)
        app.router.add_post("/v1/rerank", self.rerank)
        app.router.add_post("/rerank", self.rerank)
        app.router.add_post("/reranking", self.rerank)
        app.router.add_post("/v1/reranking", self.rerank)
        app.router.add_post("/apply-template", self.apply_template)
        app.router.add_post("/api/show", self.api_show)
        app.router.add_get("/", self.index)
        app.router.add_post("/infill", self.infill)
        app.router.add_post("/slots/{slot_id}", self.slot_action)
        app.router.add_get("/lora-adapters", self.lora_adapters_get)
        app.router.add_post("/lora-adapters", self.lora_adapters_post)
        return app


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="llama-server", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-np", "--parallel", type=int, default=4, help="number of slots")
    ap.add_argument("--api-key", default=None)
    ap.add_argument("--alias", default=None, help="model name served")
    ap.add_argument("-md", "--model-draft", default=None,
                    help="draft model for server-side speculative decoding")
    ap.add_argument("--draft-max", type=int, default=8,
                    help="max tokens drafted per round (reference --draft-max)")
    ap.add_argument("--draft-p-min", type=float, default=0.75)
    ap.add_argument("--kv-layout", default="slots", choices=("slots", "paged"),
                    help="paged = shared-prefix page-aliased KV cache")
    ap.add_argument("--kv-page-size", type=int, default=128)
    ap.add_argument("-ctk", "--cache-type-k", default="bf16",
                    choices=("f32", "bf16", "f16", "q8_0", "q4_0", "q4_1", "q5_0", "q5_1", "iq4_nl"),
                    help="K cache data type (reference --cache-type-k)")
    ap.add_argument("-ctv", "--cache-type-v", default=None,
                    choices=("f32", "bf16", "f16", "q8_0", "q4_0", "q4_1", "q5_0", "q5_1", "iq4_nl"),
                    help="V cache data type (reference --cache-type-v; "
                         "defaults to -ctk)")
    ap.add_argument("--props", action="store_true",
                    help="enable changing global properties via POST /props")
    ap.add_argument("--slot-save-path", default=None,
                    help="directory for slot save/restore files (required "
                         "to enable /slots/{id}?action=save|restore)")
    ap.add_argument("--reasoning-format", default="auto",
                    choices=("auto", "deepseek", "none"),
                    help="extract <think> blocks into reasoning_content")
    ap.add_argument("--chat-template", default=None,
                    help="builtin template name (chatml, llama3, ...) or "
                         "jinja text overriding the model's template")
    ap.add_argument("--decode-chunk", type=int, default=8,
                    help=">1: scan N decode steps per device dispatch when "
                         "all slots are generating (streamed tokens arrive "
                         "in bursts of N; kills the ~1 ms/token host "
                         "dispatch). 1 = per-token dispatch. Chunking "
                         "auto-disables while prompt work is pending, in "
                         "spec mode, and near context boundaries")
    # multi-host SPMD (the reference's rpc-server workflow dissolves into
    # jax.distributed — parallel/distributed.py): every host runs THIS
    # same command; host 0's HTTP endpoint serves
    ap.add_argument("-tp", "--tensor-parallel", type=int, default=1,
                    help="shard weights/KV over N chips (split-mode ROW)")
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="jax.distributed coordinator address (multi-host)")
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--host-id", type=int, default=None)
    return ap


def main(argv=None) -> int:
    from ..utils.args import parse_with_env

    args = parse_with_env(build_arg_parser(), argv)

    logging.basicConfig(level=logging.INFO)
    from ..utils.jax_setup import setup_jax

    setup_jax()
    if args.coordinator or (args.num_hosts and args.num_hosts > 1):
        from ..parallel.distributed import init_distributed

        host_idx = init_distributed(args.coordinator, args.num_hosts,
                                    args.host_id)
        print(f"jax.distributed: host {host_idx}/{args.num_hosts}",
              file=sys.stderr)
    from ..runtime.loader import load_model

    model = load_model(args.model)
    # in-engine speculative decoding: drafting + packed verify run inside
    # the continuous-batching engine (all slots, any kv_layout) — the
    # reference's per-slot spec inside update_slots, batched
    draft = load_model(args.model_draft) if args.model_draft else None
    engine = Engine(model, n_slots=args.parallel,
                    n_ctx_per_slot=args.ctx_size,
                    kv_layout=args.kv_layout,
                    page_size=args.kv_page_size,
                    kv_dtype=args.cache_type_k,
                    kv_v_dtype=args.cache_type_v,
                    draft_model=draft, n_draft=args.draft_max,
                    p_min=args.draft_p_min, tp=args.tensor_parallel,
                    decode_chunk=args.decode_chunk)
    engine.start()
    server = Server(engine, model_name=args.alias or args.model,
                    api_key=args.api_key, chat_template=args.chat_template,
                    reasoning_format=args.reasoning_format,
                    slot_save_path=args.slot_save_path,
                    endpoint_props=args.props)
    print(f"listening on http://{args.host}:{args.port}", file=sys.stderr)
    web.run_app(server.make_app(), host=args.host, port=args.port, print=None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
