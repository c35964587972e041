"""Speculative serving engine.

Server-side speculative decoding (reference examples/server server.cpp:1249,
1370: per-slot draft contexts): a draft model proposes tokens and the target
verifies them in one batch. This adapter exposes the Engine interface the
HTTP server drives (submit/start/stop/metrics/slots/embed), backed by one
target + one draft LlamaContext pair per slot-equivalent worker. Requests
are served sequentially per worker (speculation trades batch parallelism
for per-stream latency, like the reference running spec slots).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass

import numpy as np

from ..runtime.context import LlamaContext
from ..runtime.engine import Request, SlotState, _Slot
from ..runtime.loader import LoadedModel
from ..runtime.speculative import SpecParams, SpeculativeDecoder

log = logging.getLogger(__name__)


class SpecEngine:
    """Engine-compatible facade running draft/verify speculative decode."""

    def __init__(self, model: LoadedModel, draft_model: LoadedModel, *,
                 n_ctx_per_slot: int = 1024, n_draft: int = 8,
                 p_min: float = 0.75, **_ignored):
        self.model = model
        self.cfg = model.cfg
        self.vocab = model.vocab
        self.tokenizer = model.tokenizer
        self.n_slots = 1
        self.n_ctx = n_ctx_per_slot
        self.target = LlamaContext(model, n_ctx=n_ctx_per_slot)
        self.draft = LlamaContext(draft_model, n_ctx=n_ctx_per_slot)
        self.spec_params = SpecParams(n_draft=n_draft, p_min=p_min)
        self.slots = [_Slot(0)]
        self.queue: queue.Queue[Request] = queue.Queue()
        self._rid = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.metrics = {
            "prompt_tokens_total": 0,
            "tokens_predicted_total": 0,
            "n_requests": 0,
            "n_errors": 0,
            "deferred": 0,
            "draft_proposed_total": 0,
            "draft_accepted_total": 0,
        }

    # -- Engine interface -----------------------------------------------------
    def submit(self, req: Request) -> Request:
        with self._lock:
            self._rid += 1
            req.rid = self._rid
        req.t_start = time.perf_counter()
        self.metrics["n_requests"] += 1
        self.queue.put(req)
        return req

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                req = self.queue.get(timeout=0.05)
            except queue.Empty:
                continue
            self._serve(req)

    def _serve(self, req: Request) -> None:
        from ..runtime.sampling import Greedy, SamplerChain

        slot = self.slots[0]
        slot.state = SlotState.GENERATING
        slot.req = req
        self.target.reset()
        self.draft.reset()
        dec = SpeculativeDecoder(self.target, self.draft, self.spec_params)
        sampler = req.sampler or SamplerChain([Greedy()])
        self.metrics["prompt_tokens_total"] += req.n_prompt
        decoded_len = 0
        try:
            if req.n_prompt >= self.n_ctx:
                raise ValueError(
                    f"prompt ({req.n_prompt}) exceeds context {self.n_ctx}")
            first = True
            for tok in dec.generate(req.prompt_tokens,
                                    max_new_tokens=req.max_new_tokens,
                                    sampler=sampler):
                if first:
                    req.t_first_token = time.perf_counter()
                    first = False
                req.result_tokens.append(tok)
                self.metrics["tokens_predicted_total"] += 1
                piece = ""
                finished = None
                if self.tokenizer is not None:
                    text = self.tokenizer.decode(req.result_tokens)
                    piece = text[decoded_len:]
                    for stop_s in req.stop_strings:
                        if stop_s in text:
                            piece = text[decoded_len : text.index(stop_s)]
                            finished = "stop"
                            break
                    if not finished:
                        decoded_len = len(text)
                if self.vocab is not None and self.vocab.is_eog(tok):
                    finished = finished or "stop"
                if req.stream_cb is not None and (piece or finished):
                    req.stream_cb(req.rid, {"token": tok, "piece": piece,
                                            "finished": finished})
                if finished:
                    req.stop_reason = finished
                    break
            else:
                req.stop_reason = req.stop_reason or "length"
                if req.stream_cb is not None:
                    req.stream_cb(req.rid, {"token": -1, "piece": "",
                                            "finished": "length"})
        except Exception as e:  # pragma: no cover — defensive
            log.exception("spec engine error")
            req.error = str(e)
            self.metrics["n_errors"] += 1
        finally:
            self.metrics["draft_proposed_total"] = dec.stats.n_draft_proposed
            self.metrics["draft_accepted_total"] = dec.stats.n_draft_accepted
            req.t_end = time.perf_counter()
            slot.state = SlotState.FREE
            slot.req = None
            req.done.set()

    @property
    def n_busy_slots(self) -> int:
        return sum(1 for s in self.slots if s.state != SlotState.FREE)

    def embed(self, tokens, pooling: str = "mean"):
        raise NotImplementedError("embeddings unavailable in speculative mode")

    def set_lora(self, adapter, scale: float = 1.0) -> None:
        raise NotImplementedError("LoRA hot-swap unavailable in speculative mode")
