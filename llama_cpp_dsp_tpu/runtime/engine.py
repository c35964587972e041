"""Continuous-batching engine.

Capability mirror of the reference server's slot machinery
(examples/server/server.cpp:2847 update_slots + src/llama-batch.cpp):
N fixed slots share one batched KV cache; prompt processing is chunked
(bucketed shapes, one slot at a time, written into the slot's cache region);
all generating slots decode together in a single [B, 1] step per iteration;
sampling/stop handling is host-side per slot.

The ggml_backend_sched + per-graph allocation of the reference dissolve
into two jitted programs (prefill, batched-decode) over fixed shapes.
"""

from __future__ import annotations

import contextlib
import enum
import logging
import queue
import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import forward
from .kv_cache import KVCache
from .loader import LoadedModel
from .sampling import SamplerChain, make_chain

log = logging.getLogger(__name__)


class SlotState(enum.Enum):
    FREE = "free"
    PROMPT = "prompt"
    GENERATING = "generating"


@dataclass
class Request:
    rid: int
    prompt_tokens: list[int]
    max_new_tokens: int = 128
    sampler: SamplerChain | None = None
    stop_tokens: set[int] = field(default_factory=set)
    stop_strings: list[str] = field(default_factory=list)
    stream_cb: Callable[[int, dict], None] | None = None  # (rid, event)
    echo: bool = False
    n_probs: int = 0  # >0: record top-N logprobs per generated token
    # filled by the engine
    result_tokens: list[int] = field(default_factory=list)
    result_logprobs: list = field(default_factory=list)  # per generated
    # token: {"token": id, "logprob": lp, "top": [(id, lp), ...]}
    prompt_logprobs: list = field(default_factory=list)  # echo+n_probs:
    # one entry per prompt token (first is None — no context)
    done: threading.Event = field(default_factory=threading.Event)
    error: str | None = None
    error_status: int = 400  # HTTP status the server maps `error` to
    # (400 = request rejected, 500 = engine fault mid-decode)
    stop_reason: str = ""
    stop_word: str = ""  # the stop string that fired (reference stop_type
    # "word" vs "eos" distinction, server.cpp stopping_word)
    cancelled: bool = False  # abort-callback role (reference llama.h:964)
    t_start: float = 0.0
    t_first_token: float = 0.0
    t_end: float = 0.0

    @property
    def n_prompt(self) -> int:
        return len(self.prompt_tokens)


@dataclass
class _Slot:
    idx: int
    state: SlotState = SlotState.FREE
    req: Request | None = None
    n_past: int = 0
    prompt_pos: int = 0  # tokens of the prompt already processed
    last_token: int = -1
    generated: int = 0
    decoded_text_len: int = 0
    # tokens whose KV rows are valid in this slot (survives slot FREE —
    # the per-slot prompt cache, reference server slot.cache_tokens)
    cache_tokens: list[int] = field(default_factory=list)
    # tokens whose DRAFT-cache rows are valid (speculative decoding);
    # healed against cache_tokens by common-prefix catch-up each round
    draft_tokens: list[int] = field(default_factory=list)


class Engine:
    """Owns device state; drive with submit() + run loop (or step() manually)."""

    def __init__(
        self,
        model: LoadedModel,
        *,
        n_slots: int = 4,
        n_ctx_per_slot: int = 1024,
        compute_dtype=jnp.bfloat16,
        kv_dtype="bf16",
        kv_v_dtype=None,  # split -ctv (reference common/arg.cpp:699);
        # mixed K/V pairs use MixedKVCache on the XLA attention path
        prefill_buckets: tuple[int, ...] = (32, 128, 512),
        use_pallas: bool | None = None,
        context_shift: bool = True,  # per-slot shift when a slot fills
        kv_layout: str = "slots",  # "slots" | "paged" (shared-prefix pages)
        page_size: int = 128,
        draft_model: LoadedModel | None = None,  # in-engine speculative
        # decoding across ALL slots (reference server.cpp per-slot spec)
        n_draft: int = 8,
        p_min: float = 0.75,
        tp: int = 1,  # tensor-parallel serving (see LlamaContext tp)
        decode_chunk: int | None = None,  # >1: scan N decode steps per
        # dispatch when all slots are generating on the device sampler
        # (streamed tokens arrive in bursts of N). None = auto: 8 on TPU
        # (kills the ~1 ms/token host dispatch — the B=1 serving path was
        # 4x slower than the CLI without it), 1 elsewhere (CPU test
        # compiles of the scan body are minutes on one core)
    ):
        self.kv_layout = kv_layout
        self.context_shift = context_shift
        if decode_chunk is None:
            decode_chunk = 8 if jax.devices()[0].platform == "tpu" else 1
        self.decode_chunk = max(1, decode_chunk)
        from .context import _convert_to_kernel_weights

        if use_pallas is None:
            use_pallas = jax.devices()[0].platform == "tpu" and tp <= 1
        if tp > 1 and use_pallas:
            log.warning("tensor-parallel forces the XLA path (use_pallas off)")
            use_pallas = False
        if use_pallas:
            model = _convert_to_kernel_weights(model)
        self.model = model
        self.cfg = model.cfg
        self.vocab = model.vocab
        self.tokenizer = model.tokenizer
        self.n_slots = n_slots
        self.n_ctx = n_ctx_per_slot
        self.prefill_buckets = [b for b in prefill_buckets if b <= n_ctx_per_slot] or [
            n_ctx_per_slot
        ]
        self._mesh = None
        if tp > 1:
            from ..parallel.sharding import (
                ShardingConfig, make_mesh, shard_params,
            )

            self._mesh = make_mesh(ShardingConfig(tp=tp, dp=1))
            self.params = shard_params(model.params, model.cfg, self._mesh)
        else:
            self.params = jax.tree.map(jnp.asarray, model.params)
        cfg = self.cfg
        from .kv_cache import make_kv_cache

        if not isinstance(kv_dtype, str):
            kv_dtype = {jnp.float32: "f32", jnp.bfloat16: "bf16",
                        jnp.float16: "f16"}.get(kv_dtype, "bf16")
        if kv_layout == "paged":
            if kv_v_dtype is not None and kv_v_dtype != kv_dtype:
                raise ValueError(
                    "paged KV does not support split -ctk/-ctv "
                    f"({kv_dtype} vs {kv_v_dtype}); use kv_layout='slots'")
            from .paged_kv import (
                PageAllocator, PagedKVCache, PagedQuantKVCache, PagedSeq,
            )

            blocks = -(-n_ctx_per_slot // page_size)
            self.n_ctx = n_ctx_per_slot = blocks * page_size
            n_pages = n_slots * blocks + n_slots  # + COW slack
            self._page_alloc = PageAllocator(n_pages)
            self._seqs = [PagedSeq(self._page_alloc, blocks)
                          for _ in range(n_slots)]
            if kv_dtype in ("q8_0", "q8"):
                self.cache = PagedQuantKVCache.create(
                    cfg.n_layers, n_pages, n_slots, blocks,
                    cfg.kv_cache_heads, cfg.kv_cache_dim,
                    page_size=page_size,
                )
            elif kv_dtype in ("q4_0", "q4"):
                from .paged_kv import PagedQ4KVCache

                self.cache = PagedQ4KVCache.create(
                    cfg.n_layers, n_pages, n_slots, blocks,
                    cfg.kv_cache_heads, cfg.kv_cache_dim,
                    page_size=page_size,
                )
            elif kv_dtype not in ("f32", "bf16", "f16"):
                # no silent bf16 fallback for e.g. q4_1 (4x the requested
                # KV memory and wrong measurements); match the split-ctv
                # error above
                raise ValueError(
                    f"paged KV does not support -ctk {kv_dtype}; "
                    "use q8_0/q4_0 or kv_layout='slots'")
            else:
                dt = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                      "f16": jnp.float16}.get(kv_dtype, jnp.bfloat16)
                self.cache = PagedKVCache.create(
                    cfg.n_layers, n_pages, n_slots, blocks,
                    cfg.kv_cache_heads, cfg.kv_cache_dim,
                    page_size=page_size, dtype=dt,
                )
        else:
            self.cache = make_kv_cache(
                cfg.n_layers, n_slots, n_ctx_per_slot, cfg.kv_cache_heads,
                cfg.kv_cache_dim, kv_dtype, v_type=kv_v_dtype,
            )
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import cache_sharding

            sh = (cache_sharding(self._mesh)
                  if cfg.kv_cache_heads % tp == 0 and kv_layout != "paged"
                  else NamedSharding(self._mesh, P()))
            self.cache = jax.tree.map(lambda a: jax.device_put(a, sh),
                                      self.cache)
        self.compute_dtype = compute_dtype
        self.slots = [_Slot(i) for i in range(n_slots)]
        self.queue: queue.Queue[Request] = queue.Queue()
        self._rid = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # metrics (reference server.cpp /metrics)
        self.metrics = {
            "prompt_tokens_total": 0,
            "tokens_predicted_total": 0,
            "n_requests": 0,
            "n_errors": 0,
            "deferred": 0,
        }

        @partial(jax.jit, donate_argnums=(1,))
        def _prefill(params, cache, tokens, positions, slot, n_past):
            """Single-slot chunked prefill: tokens [1, T] written into the
            slot's cache rows; returns last-token logits."""
            mask = _slot_mask(positions, cache.capacity, n_past)
            sub = cache.slot_view(slot)
            logits, sub = forward(
                params, self.cfg, tokens, positions, sub, n_past, mask,
                compute_dtype=self.compute_dtype,
            )
            return logits, cache.merge_slot(sub, slot)

        use_flash = use_pallas  # MLA now has its own fused decode path

        @partial(jax.jit, donate_argnums=(1,))
        def _decode(params, cache, tokens, positions, active):
            """Batched one-token decode for all slots; `active` masks unused
            slots. tokens/positions [B, 1]; per-slot KV writes at positions."""
            mask = _slot_mask(positions, cache.capacity, None)
            mask = mask & active[:, None, None]
            # idle slots write at capacity (OOB-dropped) — a 0 offset would
            # clobber row 0 of their prompt caches every decode round
            offs = jnp.where(active, positions[:, 0], cache.capacity)
            logits, cache = forward(
                params, self.cfg, tokens, positions, cache,
                offs, mask, compute_dtype=self.compute_dtype,
                flash=use_flash,
            )
            return logits, cache

        @partial(jax.jit, donate_argnums=(1,))
        def _decode_argmax(params, cache, tokens, positions, active):
            """Greedy fast path: only [B] token ids leave the device (full
            logits stay on-chip) — used when every active slot samples
            greedily with no stateful samplers."""
            logits, cache = _decode(params, cache, tokens, positions, active)
            return jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32), cache

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("top_k",))
        def _decode_sample(params, cache, tokens, positions, active, key,
                           temp, top_p, min_p, *, top_k):
            """Stochastic fast path: the whole default sampler pipeline runs
            on-chip (ops/device_sampling) — used when every active slot
            shares one stateless device_spec."""
            from ..ops.device_sampling import sample_logits

            logits, cache = _decode(params, cache, tokens, positions, active)
            ids = sample_logits(logits[:, 0, :], key, temp, top_k=top_k,
                                top_p=top_p, min_p=min_p)
            return ids, cache

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("chunk",))
        def _decode_argmax_chunk(params, cache, tokens, positions, active,
                                 *, chunk):
            """`chunk` batched greedy steps in ONE dispatch (lax.scan over
            _decode_argmax): [B, chunk] ids leave the device, amortizing the
            per-step host round-trip. Gated by the caller away from context
            boundaries so per-step semantics stay identical."""
            step = jnp.asarray(active, jnp.int32)[:, None]

            def body(carry, _):
                cache, toks, pos = carry
                ids, cache = _decode_argmax(params, cache, toks, pos, active)
                return (cache, ids[:, None], pos + step), ids

            (cache, _, _), ids = jax.lax.scan(
                body, (cache, tokens, positions), None, length=chunk)
            return ids.T, cache

        @partial(jax.jit, donate_argnums=(1,),
                 static_argnames=("top_k", "chunk"))
        def _decode_sample_chunk(params, cache, tokens, positions, active,
                                 key, temp, top_p, min_p, *, top_k, chunk):
            """Chunked variant of _decode_sample (uniform stateless device
            chains): keys split once per scan step."""
            from ..ops.device_sampling import sample_logits

            step = jnp.asarray(active, jnp.int32)[:, None]

            def body(carry, _):
                cache, toks, pos, key = carry
                key, sub = jax.random.split(key)
                logits, cache = _decode(params, cache, toks, pos, active)
                ids = sample_logits(logits[:, 0, :], sub, temp, top_k=top_k,
                                    top_p=top_p, min_p=min_p)
                return (cache, ids[:, None], pos + step, key), ids

            (cache, _, _, _), ids = jax.lax.scan(
                body, (cache, tokens, positions, key), None, length=chunk)
            return ids.T, cache

        @partial(jax.jit, donate_argnums=(1,))
        def _mixed(params, cache, tokens, slot_ids, rows, out_idx):
            """Packed prompt+decode step (reference update_slots batch):
            one weight pass serves all generating slots' tokens plus one
            prompt chunk; returns [n_slots, V] logits at out_idx."""
            from ..models.llama import forward_packed

            return forward_packed(
                params, self.cfg, tokens, slot_ids, rows, cache, out_idx,
                compute_dtype=self.compute_dtype,
            )

        from ..models.registry import arch_spec

        spec = arch_spec(self.cfg.arch)
        self._builder = spec.builder
        self._mixed_ok = (
            spec.builder == "decoder"
            and not self.cfg.kv_lora_rank
            and self.cfg.pos_embd_type != "alibi"
        )
        if kv_layout == "paged" and not self._mixed_ok:
            raise ValueError(
                "kv_layout='paged' requires the packed decoder path "
                f"(arch {self.cfg.arch} uses builder={spec.builder})")
        self._prefill_fn = _prefill
        self._decode_fn = _decode
        self._decode_argmax_fn = _decode_argmax
        self._decode_sample_fn = _decode_sample
        self._decode_argmax_chunk_fn = _decode_argmax_chunk
        self._decode_sample_chunk_fn = _decode_sample_chunk
        self._dev_key = jax.random.PRNGKey(0)
        self._mixed_fn = _mixed

        # -- in-engine speculative decoding (reference server.cpp:1249 per-
        # slot draft contexts inside update_slots): a draft model proposes
        # greedily for every generating slot in one batched loop; the target
        # verifies all slots' candidates in ONE packed program. Works with
        # any kv_layout (paged included — only the target cache pages).
        self.has_draft = draft_model is not None
        if self.has_draft:
            if not self._mixed_ok:
                raise ValueError(
                    "speculative decoding requires the packed decoder path "
                    f"(arch {self.cfg.arch} uses builder={spec.builder})")
            if use_pallas:
                draft_model = _convert_to_kernel_weights(draft_model)
            dcfg = draft_model.cfg
            if dcfg.n_vocab != cfg.n_vocab:
                log.warning("draft vocab (%d) != target vocab (%d)",
                            dcfg.n_vocab, cfg.n_vocab)
            self.draft_cfg = dcfg
            if self._mesh is not None:
                # BASELINE config 5: sharded target + sharded draft on the
                # same mesh (the draft rides the same tp collectives)
                from ..parallel.sharding import shard_params as _shard

                self.draft_params = _shard(draft_model.params, dcfg,
                                           self._mesh)
            else:
                self.draft_params = jax.tree.map(jnp.asarray,
                                                 draft_model.params)
            self.n_draft = n_draft
            self.p_min = p_min
            self.draft_cache = make_kv_cache(
                dcfg.n_layers, n_slots, self.n_ctx, dcfg.kv_cache_heads,
                dcfg.kv_cache_dim, "bf16",
            )
            if self.context_shift:
                # rolled rows lose their token identity; the draft cache
                # could no longer be caught up from cache_tokens
                log.info("speculative decoding: context shift disabled")
                self.context_shift = False
            self.metrics["draft_proposed_total"] = 0
            self.metrics["draft_accepted_total"] = 0

            @partial(jax.jit, donate_argnums=(1,))
            def _draft_prefill(dparams, dcache, tokens, positions, slot,
                               n_past):
                mask = _slot_mask(positions, dcache.capacity, n_past)
                sub = dcache.slot_view(slot)
                _, sub = forward(
                    dparams, dcfg, tokens, positions, sub, n_past, mask,
                    compute_dtype=self.compute_dtype,
                )
                return dcache.merge_slot(sub, slot)

            @partial(jax.jit, donate_argnums=(1,))
            def _draft_step(dparams, dcache, tokens, positions, active):
                """One greedy draft step for all generating slots: returns
                (argmax ids [B], their draft probabilities [B], cache)."""
                mask = _slot_mask(positions, dcache.capacity, None)
                mask = mask & active[:, None, None]
                offs = jnp.where(active, positions[:, 0], dcache.capacity)
                logits, dcache = forward(
                    dparams, dcfg, tokens, positions, dcache, offs, mask,
                    compute_dtype=self.compute_dtype, flash=use_flash,
                )
                lg = logits[:, 0, :]
                ids = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                probs = jnp.take_along_axis(
                    jax.nn.softmax(lg, axis=-1), ids[:, None], axis=1)[:, 0]
                return ids, probs, dcache

            @partial(jax.jit, donate_argnums=(1,), static_argnames=("steps",))
            def _draft_scan(dparams, dcache, tokens, positions, active,
                            *, steps):
                """`steps` greedy draft iterations in ONE dispatch (a
                fori_loop over _draft_step's body) — the per-step host
                round-trip dominates small-draft-model latency through a
                remote-relay backend. Returns (ids [B, steps],
                probs [B, steps], cache); the host applies the p_min /
                limit truncation on the returned arrays (greedy drafting
                is deterministic, so computing past the stop point and
                discarding yields identical proposals)."""

                def body(_, carry):
                    dcache, toks, pos, ids_a, probs_a, i = carry
                    ids, probs, dcache = _draft_step(dparams, dcache, toks,
                                                     pos, active)
                    ids_a = jax.lax.dynamic_update_slice(
                        ids_a, ids[:, None], (0, i))
                    probs_a = jax.lax.dynamic_update_slice(
                        probs_a, probs[:, None], (0, i))
                    return (dcache, ids[:, None], pos + 1, ids_a, probs_a,
                            i + 1)

                b = tokens.shape[0]
                ids_a = jnp.zeros((b, steps), jnp.int32)
                probs_a = jnp.zeros((b, steps), jnp.float32)
                dcache, _, _, ids_a, probs_a, _ = jax.lax.fori_loop(
                    0, steps, body,
                    (dcache, tokens, positions, ids_a, probs_a,
                     jnp.int32(0)))
                return ids_a, probs_a, dcache

            @partial(jax.jit, donate_argnums=(1,))
            def _verify(params, cache, tokens, slot_ids, rows):
                """Packed target pass over every slot's draft candidates,
                returning logits at EVERY packed position [P, V]."""
                from ..models.llama import forward_packed

                return forward_packed(
                    params, self.cfg, tokens, slot_ids, rows, cache,
                    jnp.arange(tokens.shape[0], dtype=jnp.int32),
                    compute_dtype=self.compute_dtype,
                )

            @partial(jax.jit, donate_argnums=(1,))
            def _verify_argmax(params, cache, tokens, slot_ids, rows):
                """Greedy verify: only [P] argmax ids leave the device.
                The full-logits pull was the spec path's bottleneck through
                the dev tunnel — P×V f32 is ~32 MB on an 8B vocab per
                round vs P int32s (the same device-sampling trade as
                Engine.step's _decode_argmax)."""
                from ..models.llama import forward_packed

                logits, cache = forward_packed(
                    params, self.cfg, tokens, slot_ids, rows, cache,
                    jnp.arange(tokens.shape[0], dtype=jnp.int32),
                    compute_dtype=self.compute_dtype,
                )
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

            self._draft_prefill_fn = _draft_prefill
            self._draft_step_fn = _draft_step
            self._draft_scan_fn = _draft_scan
            self._verify_fn = _verify
            self._verify_argmax_fn = _verify_argmax

    # -- request API --------------------------------------------------------
    def submit(self, req: Request) -> Request:
        with self._lock:
            self._rid += 1
            req.rid = self._rid
        req.t_start = time.perf_counter()
        if req.echo and req.n_probs and self.kv_layout == "paged":
            # prompt logprobs need per-position prefill logits; the paged
            # layout routes all prompt work through the packed program
            # which only returns out_idx rows
            req.error = "echo+logprobs is unsupported with kv_layout='paged'"
            self.metrics["n_errors"] += 1
            req.done.set()
            return req
        self.metrics["n_requests"] += 1
        self.queue.put(req)
        return req

    def generate_sync(self, prompt_tokens: list[int], **kw) -> Request:
        req = Request(0, list(prompt_tokens), **kw)
        self.submit(req)
        if self._thread is None:
            while not req.done.is_set():
                self.step()
        else:
            req.done.wait()
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
                worked = self.step()
            except Exception as e:  # noqa: BLE001 — last-resort fence:
                # anything escaping step()'s per-op _kv_fence guards (e.g.
                # slot assignment) must not kill the worker thread and hang
                # every queued request's `done` event
                log.exception("engine loop error; failing busy slots")
                self._fail_slots(
                    [s for s in self.slots if s.state != SlotState.FREE], e)
                continue
            if not worked:
                try:
                    req = self.queue.get(timeout=0.05)
                    self.queue.put(req)  # step() will pick it up
                except queue.Empty:
                    pass

    # -- engine core ----------------------------------------------------------
    @staticmethod
    def _common_prefix(a: list[int], b: list[int]) -> int:
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    def _assign_slots(self) -> None:
        while True:
            free = [s for s in self.slots if s.state == SlotState.FREE]
            if not free:
                return
            try:
                req = self.queue.get_nowait()
            except queue.Empty:
                return
            if req.n_prompt >= self.n_ctx:
                req.error = f"prompt ({req.n_prompt} tokens) exceeds slot context {self.n_ctx}"
                self.metrics["n_errors"] += 1
                req.done.set()
                continue
            # prompt-cache reuse (reference update_slots common-prefix reuse
            # + llama_kv_self_seq_cp): pick the FREE slot with the longest
            # cached common prefix; if a busier slot caches an even longer
            # one, seq_cp its rows into the chosen slot instead
            # tie-break: preserve the most valuable other caches (pick the
            # free slot with the least cached content when prefixes tie)
            slot = max(free, key=lambda s: (
                self._common_prefix(s.cache_tokens, req.prompt_tokens),
                -len(s.cache_tokens)))
            n_reuse = min(self._common_prefix(slot.cache_tokens,
                                              req.prompt_tokens),
                          req.n_prompt - 1)
            donor = max(self.slots, key=lambda s: self._common_prefix(
                s.cache_tokens, req.prompt_tokens))
            n_donor = min(self._common_prefix(donor.cache_tokens,
                                              req.prompt_tokens),
                          req.n_prompt - 1)
            if self.kv_layout == "paged":
                ps = self.cache.page_size
                if donor is not slot and (n_donor // ps) * ps > n_reuse:
                    # zero-copy: alias the donor's full prefix pages
                    shared = self._seqs[slot.idx].share_prefix_from(
                        self._seqs[donor.idx], n_donor, ps)
                    self.cache = self.cache.set_table_row(
                        slot.idx, self._seqs[slot.idx].table_row(
                            self.cache.n_pages))
                    slot.cache_tokens = list(donor.cache_tokens[:shared])
                    n_reuse = min(shared, req.n_prompt - 1)
                # blocks past the reused prefix must be exclusively owned
                self._cow_from(slot.idx, n_reuse)
            elif donor is not slot and n_donor > n_reuse + 16:
                from .cache_ops import copy_slot

                self.cache = copy_slot(self.cache, donor.idx, slot.idx)
                slot.cache_tokens = list(donor.cache_tokens)
                n_reuse = n_donor
            if req.echo and req.n_probs:
                # echo+logprobs: every prompt row must actually be
                # evaluated — no prefix reuse
                n_reuse = 0
                slot._echo_prev_row = None
            slot.state = SlotState.PROMPT
            slot.req = req
            slot.n_past = n_reuse
            slot.prompt_pos = n_reuse
            slot.generated = 0
            slot.decoded_text_len = 0
            slot.cache_tokens = list(req.prompt_tokens[:n_reuse])
            if n_reuse:
                self.metrics["prompt_tokens_cached"] = (
                    self.metrics.get("prompt_tokens_cached", 0) + n_reuse)
            if req.sampler is None:
                req.sampler = make_chain(temp=0.0)
            log.info("slot %d: rid=%d prompt=%d tokens (%d cached)",
                     slot.idx, req.rid, req.n_prompt, n_reuse)

    @staticmethod
    def _probs_entry(logits_row: np.ndarray, token: int, n: int) -> dict:
        row = np.asarray(logits_row, np.float64)
        m = row.max()
        lp = row - (m + np.log(np.exp(row - m).sum()))
        top = np.argsort(-row)[:n]
        return {"token": int(token), "logprob": float(lp[token]),
                "top": [(int(i), float(lp[i])) for i in top]}

    def _record_probs(self, req: Request, logits_row: np.ndarray,
                      token: int) -> None:
        """Top-N logprobs for one predicted token (reference n_probs /
        OpenAI logprobs). Only reachable on host-sampling paths."""
        if not req.n_probs:
            return
        req.result_logprobs.append(
            self._probs_entry(logits_row, token, req.n_probs))

    def step(self) -> bool:
        """One engine iteration. Returns True if any work was done.

        Decode runs FIRST and prefill advances one chunk per iteration:
        the reference mixes generating tokens and prompt chunks in one
        llama_decode batch (update_slots); when both kinds of work exist
        and the arch supports it, ONE packed program (_mixed_fn) serves
        them together — a single pass over the weights instead of two.
        Otherwise: decode-priority round-robin with one chunk per step."""
        self._assign_slots()
        worked = False

        if self._mixed_ok:
            gen = [s for s in self.slots if s.state == SlotState.GENERATING]
            has_prompt = any(
                s.state == SlotState.PROMPT
                and not (s.req.echo and s.req.n_probs)
                for s in self.slots)
            # paged mode routes ALL prompt work through the packed program
            # (there is no contiguous slot_view over pages)
            if has_prompt and (gen or self.kv_layout == "paged"):
                busy = [s for s in self.slots if s.state != SlotState.FREE]
                with self._kv_fence(busy):
                    return self._mixed_step(gen)
                return True  # fence swallowed a failure; keep serving

        # 1. one prompt chunk per iteration (round-robin over prompt slots)
        start = getattr(self, "_prefill_rr", 0)
        for slot in self.slots[start:] + self.slots[:start]:
            if slot.state != SlotState.PROMPT:
                continue
            with self._kv_fence([slot]):
                req = slot.req
                remaining = req.prompt_tokens[slot.prompt_pos :]
                bucket = self._bucket(len(remaining))
                chunk = remaining[:bucket]
                logits = self._prefill_slot(slot, chunk)
                slot.prompt_pos += len(chunk)
                slot.n_past += len(chunk)
                slot.cache_tokens = list(req.prompt_tokens[: slot.prompt_pos])
                self.metrics["prompt_tokens_total"] += len(chunk)
                if slot.prompt_pos >= req.n_prompt:
                    token = req.sampler.sample(logits)
                    self._record_probs(req, logits, token)
                    req.t_first_token = time.perf_counter()
                    slot.state = SlotState.GENERATING
                    self._emit_token(slot, token)
            worked = True
            self._prefill_rr = (slot.idx + 1) % self.n_slots
            break  # at most one chunk per step keeps decode latency bounded

        # 2. batched decode for all generating slots
        gen = [s for s in self.slots if s.state == SlotState.GENERATING]
        if gen and getattr(self, "has_draft", False):
            with self._kv_fence(gen):
                self._spec_decode(gen)
            return True
        if gen:
            with self._kv_fence(gen):
                self._decode_gen(gen)
            worked = True
        return worked

    def _decode_gen(self, gen: list["_Slot"]) -> None:
            # multi-token dispatch (throughput mode): scan `chunk` decode
            # steps on device when no prompt work is pending and no slot
            # can hit its context boundary mid-chunk (the _emit_token shift
            # must only fire between dispatches)
            chunk = 1
            if (self.decode_chunk > 1 and not getattr(self, "has_draft", False)
                    and not any(s.state == SlotState.PROMPT
                                for s in self.slots)
                    and self.queue.empty()
                    and all(s.n_past + self.decode_chunk + 1 < self.n_ctx
                            for s in gen)):
                chunk = self.decode_chunk
            self._ensure_pages([(s.idx, s.n_past + chunk) for s in gen])
            tokens = np.zeros((self.n_slots, 1), np.int32)
            positions = np.zeros((self.n_slots, 1), np.int32)
            active = np.zeros(self.n_slots, bool)
            for s in gen:
                tokens[s.idx, 0] = s.last_token
                positions[s.idx, 0] = s.n_past
                active[s.idx] = True

            def consume(ids_np):  # [B, chunk] → emit per slot, stop early
                for s in gen:
                    for j in range(ids_np.shape[1]):
                        s.cache_tokens.append(s.last_token)
                        s.n_past += 1
                        token = int(ids_np[s.idx, j])
                        s.req.sampler.accept(token)
                        self._emit_token(s, token)
                        if s.state != SlotState.GENERATING:
                            break  # overshoot rows sit beyond n_past

            probs_needed = any(s.req.n_probs for s in gen)
            if not probs_needed and all(
                    s.req.sampler is not None and s.req.sampler.is_greedy
                    for s in gen):
                if chunk > 1:
                    ids, self.cache = self._decode_argmax_chunk_fn(
                        self.params, self.cache, jnp.asarray(tokens),
                        jnp.asarray(positions), jnp.asarray(active),
                        chunk=chunk)
                    consume(np.asarray(ids))
                else:
                    ids, self.cache = self._decode_argmax_fn(
                        self.params, self.cache, jnp.asarray(tokens),
                        jnp.asarray(positions), jnp.asarray(active),
                    )
                    consume(np.asarray(ids)[:, None])
            elif not probs_needed and (specs := [
                    s.req.sampler.device_spec
                    if s.req.sampler is not None else None
                    for s in gen]) and all(
                    sp is not None and sp == specs[0] for sp in specs):
                # uniform stateless chains: sample ON DEVICE — only [B]
                # token ids leave the chip (ops/device_sampling.py)
                sp = specs[0]
                self._dev_key, sub = jax.random.split(self._dev_key)
                if chunk > 1:
                    ids, self.cache = self._decode_sample_chunk_fn(
                        self.params, self.cache, jnp.asarray(tokens),
                        jnp.asarray(positions), jnp.asarray(active), sub,
                        jnp.float32(sp["temp"]), jnp.float32(sp["top_p"]),
                        jnp.float32(sp["min_p"]), top_k=sp["top_k"],
                        chunk=chunk)
                    consume(np.asarray(ids))
                else:
                    ids, self.cache = self._decode_sample_fn(
                        self.params, self.cache, jnp.asarray(tokens),
                        jnp.asarray(positions), jnp.asarray(active), sub,
                        jnp.float32(sp["temp"]), jnp.float32(sp["top_p"]),
                        jnp.float32(sp["min_p"]), top_k=sp["top_k"],
                    )
                    consume(np.asarray(ids)[:, None])
            else:
                logits, self.cache = self._decode_fn(
                    self.params, self.cache, jnp.asarray(tokens),
                    jnp.asarray(positions), jnp.asarray(active),
                )
                logits_np = np.asarray(logits)
                for s in gen:
                    s.cache_tokens.append(s.last_token)
                    s.n_past += 1
                    token = s.req.sampler.sample(logits_np[s.idx, 0])
                    self._record_probs(s.req, logits_np[s.idx, 0], token)
                    self._emit_token(s, token)

    def _fail_slots(self, slots: list["_Slot"], exc: BaseException) -> None:
        """Fail every request on `slots` and free them — the engine keeps
        serving (reference server.cpp slot-error handling: send_error +
        slot.release instead of tearing the server down)."""
        for s in slots:
            req = s.req
            s.state = SlotState.FREE
            s.req = None
            s.cache_tokens = []  # rolled-back KV rows are untrusted
            s.draft_tokens = []
            if self.kv_layout == "paged":
                self._seqs[s.idx].release()
            self.metrics["n_errors"] = self.metrics.get("n_errors", 0) + 1
            if req is not None and not req.done.is_set():
                req.error = f"decode failed: {type(exc).__name__}: {exc}"
                req.error_status = 500
                req.stop_reason = "error"
                req.t_end = time.perf_counter()
                if req.stream_cb is not None:
                    try:
                        req.stream_cb(req.rid, {"token": -1, "piece": "",
                                                "finished": "error"})
                    except Exception:  # noqa: BLE001 — stream already dead
                        pass
                req.done.set()

    @contextlib.contextmanager
    def _kv_fence(self, slots: list["_Slot"]):
        """Transactional KV guard + failure containment (role of the
        reference's llama_kv_cache state guard, src/llama-kv-cache.h:31-44
        restore-on-throw, used at llama-context.cpp:1205): snapshot the
        functional cache handles before a step's mutations; if the guarded
        operation raises, restore them, fail ONLY the participating
        requests, and keep the engine alive. Functional updates make the
        snapshot free — it is just the old array tree, which XLA donation
        has not yet overwritten from the fence's point of view because the
        new tree is only assigned on success paths.

        Paged mode: pools/tables roll back with `self.cache`; failed
        slots' PagedSeqs are released (their pages return to the free
        list), and surviving slots' host-side PagedSeq bookkeeping is
        re-synced into the restored table arrays.
        """
        cache = self.cache
        draft = getattr(self, "draft_cache", None)
        try:
            yield
        except Exception as e:  # noqa: BLE001 — fence must catch everything
            log.exception("engine step failed; containing to slots %s",
                          [s.idx for s in slots])
            self.cache = cache
            if draft is not None:
                self.draft_cache = draft
            self._fail_slots(slots, e)
            if self.kv_layout == "paged":
                # re-sync table rows to the host PagedSeq source of truth
                # (the guarded op may have appended pages before raising)
                for i in range(self.n_slots):
                    self.cache = self.cache.set_table_row(
                        i, self._seqs[i].table_row(self.cache.n_pages))

    def _spec_decode(self, gen: list["_Slot"]) -> None:
        """One speculative decode round across ALL generating slots
        (reference server.cpp:1249/common/speculative.cpp, batched): catch
        the draft cache up from each slot's token history, draft up to
        n_draft greedy tokens per slot in lock-step batched draft passes
        (per-slot p_min confidence stop), verify every slot's candidates in
        ONE packed target program, and accept per slot the longest prefix
        matching the target sampler's own decisions plus one bonus token.
        Greedy requests therefore emit byte-identical output to plain
        decode, only faster. Works with paged target KV (the draft cache
        stays dense)."""
        cap = self.n_ctx
        # 1. draft catch-up: evaluate rows the draft hasn't seen (prompt
        # chunks, prefix-reused rows, post-rejection divergence)
        for s in gen:
            hist = s.cache_tokens
            common = 0
            for a, b in zip(s.draft_tokens, hist):
                if a != b:
                    break
                common += 1
            pos = common
            while pos < len(hist):
                chunk = hist[pos:pos + self.prefill_buckets[-1]]
                n = len(chunk)
                tpad = self._bucket(n)
                toks = np.zeros((1, tpad), np.int32)
                toks[0, :n] = chunk
                ps = np.full((1, tpad), pos, np.int32)
                ps[0, :n] = pos + np.arange(n)
                self.draft_cache = self._draft_prefill_fn(
                    self.draft_params, self.draft_cache, jnp.asarray(toks),
                    jnp.asarray(ps), jnp.int32(s.idx), jnp.int32(pos))
                pos += n
            s.draft_tokens = list(hist)

        # 2. batched greedy drafting — ALL n_draft iterations in ONE
        # dispatch (_draft_scan); p_min / per-slot limits are applied to
        # the returned arrays, which matches the sequential stop exactly
        # because greedy drafting is deterministic. Slots that stop early
        # still consumed all `steps` inputs on device (their extra draft
        # rows carry the unused greedy continuation and are healed by the
        # next round's common-prefix catch-up via draft_tokens).
        limits = {s.idx: max(0, min(self.n_draft, cap - s.n_past - 1))
                  for s in gen}
        drafted: dict[int, list[int]] = {s.idx: [] for s in gen}
        fed = {s.idx: 0 for s in gen}  # inputs the draft consumed (its
        # KV rows end at n_past + fed; the LAST drafted token is proposed
        # but never consumed when drafting stops at the limit)
        steps = max(limits.values())
        row_tokens: dict[int, list[int]] = {}
        if steps > 0:
            tokens = np.zeros((self.n_slots, 1), np.int32)
            positions = np.zeros((self.n_slots, 1), np.int32)
            active = np.zeros(self.n_slots, bool)
            for s in gen:
                tokens[s.idx, 0] = s.last_token
                positions[s.idx, 0] = s.n_past
                active[s.idx] = limits[s.idx] > 0
            ids, probs, self.draft_cache = self._draft_scan_fn(
                self.draft_params, self.draft_cache, jnp.asarray(tokens),
                jnp.asarray(positions), jnp.asarray(active),
                steps=self.n_draft)
            ids_np = np.asarray(ids)
            probs_np = np.asarray(probs)
            for s in gen:
                i = s.idx
                if limits[i] == 0:
                    continue
                fed[i] = self.n_draft  # the scan fed every step
                # actual draft-KV row contents this round: last_token + all
                # greedy continuations but the final (proposed, unconsumed);
                # rows past capacity were OOB-dropped, so don't claim them
                n_rows = min(self.n_draft - 1, cap - s.n_past - 1)
                row_tokens[i] = [int(t) for t in ids_np[i, :n_rows]]
                for j in range(limits[i]):
                    if probs_np[i, j] < self.p_min:
                        break  # reference p_min rule: drop + stop
                    drafted[i].append(int(ids_np[i, j]))

        # 3. ONE packed target pass over every slot's [last_token]+drafts
        total = sum(1 + len(drafted[s.idx]) for s in gen)
        p = self._bucket(total)
        if p < total:
            p = -(-total // p) * p
        toks = np.zeros(p, np.int32)
        sids = np.zeros(p, np.int32)
        rows = np.full(p, cap, np.int32)  # capacity ⇒ padding dropped
        spans: dict[int, tuple[int, int]] = {}
        i = 0
        for s in gen:
            seq = [s.last_token] + drafted[s.idx]
            spans[s.idx] = (i, len(seq))
            for j, t in enumerate(seq):
                toks[i] = t
                sids[i] = s.idx
                rows[i] = s.n_past + j
                i += 1
        self._ensure_pages(
            [(s.idx, s.n_past + 1 + len(drafted[s.idx])) for s in gen])
        greedy_dev = (not any(s.req.n_probs for s in gen)
                      and all(s.req.sampler is not None
                              and s.req.sampler.is_greedy for s in gen))
        if greedy_dev:
            ids_v, self.cache = self._verify_argmax_fn(
                self.params, self.cache, jnp.asarray(toks),
                jnp.asarray(sids), jnp.asarray(rows))
            ids_v_np = np.asarray(ids_v)
            logits_np = None
        else:
            logits, self.cache = self._verify_fn(
                self.params, self.cache, jnp.asarray(toks),
                jnp.asarray(sids), jnp.asarray(rows))
            logits_np = np.asarray(logits)

        # 4. per-slot acceptance walk with the slot's own sampler chain
        for s in gen:
            start, ln = spans[s.idx]
            cand = drafted[s.idx]
            # exactly the tokens whose draft-KV rows were written this
            # round: [last_token] + every greedy continuation the scan
            # consumed (a superset of cand — p_min only cuts the proposal)
            consumed = (row_tokens.get(s.idx, [])
                        if fed[s.idx] else cand[:max(0, fed[s.idx] - 1)])
            draft_seen = s.draft_tokens + [s.last_token] + consumed
            self.metrics["draft_proposed_total"] += len(cand)
            for j in range(ln):
                if s.state != SlotState.GENERATING:
                    break  # a stop condition fired mid-acceptance
                if logits_np is None:
                    token = int(ids_v_np[start + j])
                    s.req.sampler.accept(token)
                else:
                    token = s.req.sampler.sample(logits_np[start + j])
                    self._record_probs(s.req, logits_np[start + j], token)
                s.cache_tokens.append(s.last_token)
                s.n_past += 1
                if j < len(cand) and token == cand[j]:
                    self.metrics["draft_accepted_total"] += 1
                    self._emit_token(s, token)  # accepted draft token
                    continue
                self._emit_token(s, token)  # bonus / correction token
                break
            s.draft_tokens = draft_seen

    def _ensure_pages(self, needs: list[tuple[int, int]]) -> None:
        """Paged mode: grow block tables to cover (slot, n_tokens) writes."""
        if self.kv_layout != "paged":
            return
        for idx, n in needs:
            if self._seqs[idx].ensure(n, self.cache.page_size):
                self.cache = self.cache.set_table_row(
                    idx, self._seqs[idx].table_row(self.cache.n_pages))

    def _cow_from(self, idx: int, from_row: int) -> None:
        """Paged mode: make every block of `idx` from `from_row` on
        exclusively owned (copy-on-write) before it gets overwritten."""
        if self.kv_layout != "paged":
            return
        seq = self._seqs[idx]
        changed = False
        for blk in range(from_row // self.cache.page_size, len(seq.pages)):
            self.cache, copied = seq.make_writable(blk, self.cache)
            changed = changed or copied
        if changed:
            self.cache = self.cache.set_table_row(
                idx, seq.table_row(self.cache.n_pages))

    def _mixed_step(self, gen: list["_Slot"]) -> bool:
        """One packed prompt+decode iteration: all generating slots' next
        tokens + prompt chunks from as many PROMPT slots as fit the token
        budget, in a single device program (reference update_slots packs
        every slot's work into one llama_decode batch)."""
        start = getattr(self, "_prefill_rr", 0)
        rotation = self.slots[start:] + self.slots[:start]
        prompts = [s for s in rotation if s.state == SlotState.PROMPT
                   and not (s.req.echo and s.req.n_probs)]
        pmax = self.prefill_buckets[-1]

        budget = max(1, pmax - len(gen))
        chunks: list[tuple["_Slot", list[int]]] = []
        for s in prompts:
            if budget <= 0:
                break
            remaining = s.req.prompt_tokens[s.prompt_pos:]
            take = remaining[:budget]
            if take:
                chunks.append((s, take))
                budget -= len(take)
        n_prompt_toks = sum(len(c) for _, c in chunks)
        p = self._bucket(len(gen) + n_prompt_toks)
        # bucket may be smaller than requested total: trim the last chunks
        room = p - len(gen)
        trimmed: list[tuple["_Slot", list[int]]] = []
        for s, c in chunks:
            if room <= 0:
                break
            c = c[:room]
            room -= len(c)
            trimmed.append((s, c))
        chunks = trimmed

        tokens = np.zeros(p, np.int32)
        slot_ids = np.zeros(p, np.int32)
        rows = np.full(p, self.n_ctx, np.int32)  # capacity ⇒ padding dropped
        out_idx = np.zeros(self.n_slots, np.int32)
        i = 0
        for s in gen:
            tokens[i] = s.last_token
            slot_ids[i] = s.idx
            rows[i] = s.n_past
            out_idx[s.idx] = i
            i += 1
        for s, c in chunks:
            for j, t in enumerate(c):
                tokens[i] = t
                slot_ids[i] = s.idx
                rows[i] = s.n_past + j
                i += 1
            out_idx[s.idx] = i - 1

        self._ensure_pages([(s.idx, s.n_past + 1) for s in gen]
                           + [(s.idx, s.n_past + len(c)) for s, c in chunks])
        logits, self.cache = self._mixed_fn(
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(slot_ids), jnp.asarray(rows), jnp.asarray(out_idx),
        )
        logits_np = np.asarray(logits)

        for s in gen:
            s.cache_tokens.append(s.last_token)
            s.n_past += 1
            token = s.req.sampler.sample(logits_np[s.idx])
            self._record_probs(s.req, logits_np[s.idx], token)
            self._emit_token(s, token)
        for s, c in chunks:
            req = s.req
            s.prompt_pos += len(c)
            s.n_past += len(c)
            s.cache_tokens = list(req.prompt_tokens[: s.prompt_pos])
            self.metrics["prompt_tokens_total"] += len(c)
            if s.prompt_pos >= req.n_prompt:
                token = req.sampler.sample(logits_np[s.idx])
                self._record_probs(req, logits_np[s.idx], token)
                req.t_first_token = time.perf_counter()
                s.state = SlotState.GENERATING
                self._emit_token(s, token)
        if chunks:
            self._prefill_rr = (chunks[-1][0].idx + 1) % self.n_slots
        return True

    def _bucket(self, n: int) -> int:
        for b in self.prefill_buckets:
            if n <= b:
                return b
        return self.prefill_buckets[-1]

    def _prefill_slot(self, slot: _Slot, chunk: list[int]) -> np.ndarray:
        n = len(chunk)
        tpad = self._bucket(n)
        toks = np.zeros((1, tpad), np.int32)
        toks[0, :n] = chunk
        pos = np.full((1, tpad), slot.n_past, np.int32)
        pos[0, :n] = slot.n_past + np.arange(n)
        logits, self.cache = self._prefill_fn(
            self.params, self.cache, jnp.asarray(toks), jnp.asarray(pos),
            jnp.int32(slot.idx), jnp.int32(slot.n_past),
        )
        req = slot.req
        if req is not None and req.echo and req.n_probs:
            # prompt logprobs (OpenAI echo+logprobs, the lm-eval
            # loglikelihood pattern): row i predicts prompt token i+1
            rows = np.asarray(logits[0, :n])
            prev = getattr(slot, "_echo_prev_row", None)
            if slot.prompt_pos == 0:
                req.prompt_logprobs.append(None)  # first token: no context
            elif prev is not None:
                req.prompt_logprobs.append(
                    self._probs_entry(prev, chunk[0], req.n_probs))
            for i in range(n - 1):
                req.prompt_logprobs.append(
                    self._probs_entry(rows[i], chunk[i + 1], req.n_probs))
            slot._echo_prev_row = rows[n - 1]
        return np.asarray(logits[0, n - 1])

    def cancel(self, rid: int) -> bool:
        """Cancel a queued or running request (client disconnect / abort)."""
        for slot in self.slots:
            if slot.req is not None and slot.req.rid == rid:
                slot.req.cancelled = True
                return True
        drained, found = [], False
        try:
            while True:
                r = self.queue.get_nowait()
                if r.rid == rid:
                    r.cancelled = True
                    r.error = "cancelled"
                    r.done.set()
                    found = True
                else:
                    drained.append(r)
        except queue.Empty:
            pass
        for r in drained:
            self.queue.put(r)
        return found

    def _emit_token(self, slot: _Slot, token: int) -> None:
        req = slot.req
        if req.cancelled:
            req.stop_reason = "cancelled"
            req.t_end = time.perf_counter()
            slot.state = SlotState.FREE
            slot.req = None
            if req.stream_cb is not None:
                req.stream_cb(req.rid, {"token": -1, "piece": "",
                                        "finished": "cancelled"})
            req.done.set()
            return
        slot.last_token = token
        req.result_tokens.append(token)
        slot.generated += 1
        self.metrics["tokens_predicted_total"] += 1

        finished = None
        if self.vocab is not None and self.vocab.is_eog(token):
            finished = "stop"
        elif token in req.stop_tokens:
            finished = "stop"
        elif slot.generated >= req.max_new_tokens:
            finished = "length"
        elif slot.n_past + 1 >= self.n_ctx:
            if self.context_shift:
                self._shift_slot(slot)
            else:
                finished = "length"

        piece = ""
        if self.tokenizer is not None:
            text = self.tokenizer.decode(req.result_tokens)
            piece = text[slot.decoded_text_len :]
            for stop in req.stop_strings:
                if stop in text:
                    cut = text.index(stop)
                    piece = text[slot.decoded_text_len : cut]
                    finished = "stop"
                    req.stop_word = stop  # native stop_type "word"
                    break
            if not finished:
                slot.decoded_text_len = len(text)
        if req.stream_cb is not None and (piece or finished):
            req.stream_cb(req.rid, {"token": token, "piece": piece, "finished": finished})

        if finished:
            req.stop_reason = finished
            req.t_end = time.perf_counter()
            slot.state = SlotState.FREE
            slot.req = None
            req.done.set()

    def _shift_slot(self, slot: "_Slot", n_keep: int = 0,
                    n_discard: int | None = None) -> None:
        """Per-slot context shift (reference server.cpp:2879-2911): evict
        n_discard cells after n_keep in THIS slot only; other slots keep
        identity indices."""
        import numpy as np

        from .cache_ops import apply_seq_edit, context_shift_indices

        if n_discard is None:
            n_discard = max(1, (self.n_ctx - n_keep) // 2)
        src1, deltas1 = context_shift_indices(self.n_ctx, n_keep, n_discard)
        ff = self.params["layers"][0].get("rope_freqs")
        if self.kv_layout == "paged":
            # gather the sequence's pages to a dense view, apply the same
            # rope-rebased edit, scatter back (pages COW'd first so shared
            # prefixes elsewhere stay intact)
            from .kv_cache import KVCache

            # full allocation before gather/scatter: sentinel table entries
            # would clamp onto other sequences' pages
            self._ensure_pages([(slot.idx, self.n_ctx)])
            self._cow_from(slot.idx, 0)
            k, v = self.cache.gather_seq(slot.idx)  # stacked [L,1,Hkv,S,D]
            tmp = apply_seq_edit(
                KVCache(tuple(k), tuple(v)), src1, deltas1, self.cfg.rope, ff)
            self.cache = self.cache.scatter_seq(
                slot.idx, jnp.stack(tmp.k), jnp.stack(tmp.v))
        else:
            src = np.tile(np.arange(self.n_ctx, dtype=np.int64),
                          (self.n_slots, 1))
            deltas = np.zeros((self.n_slots, self.n_ctx), np.int64)
            src[slot.idx] = src1[0]
            deltas[slot.idx] = deltas1[0]
            self.cache = apply_seq_edit(self.cache, src, deltas,
                                        self.cfg.rope, ff)
        slot.n_past -= n_discard
        slot.cache_tokens = []  # shifted rows no longer prefix-addressable
        log.info("slot %d: context shift (-%d tokens)", slot.idx, n_discard)

    # -- embeddings (reference server /v1/embeddings, pooling_type) ----------
    def _encode(self, tokens: list[int], pooling: str) -> np.ndarray:
        """Encoder-arch (bert family) forward: bidirectional attention with
        a padding mask; pooling none/mean/cls/rank handled in-model."""
        from ..models.bert import bert_forward

        if not hasattr(self, "_encode_fn"):
            @partial(jax.jit, static_argnames=("t", "pooling"))
            def _enc(params, toks, mask, t, pooling):
                return bert_forward(params, self.cfg, toks, mask,
                                    compute_dtype=self.compute_dtype,
                                    pooling=pooling)

            self._encode_fn = _enc
        n = len(tokens)
        tpad = self._bucket(n)
        if tpad < n:
            tpad = -(-n // tpad) * tpad
        buf = np.zeros((1, tpad), np.int32)
        buf[0, :n] = tokens
        mask = np.zeros((1, tpad), bool)
        mask[0, :n] = True
        out = np.asarray(self._encode_fn(
            self.params, jnp.asarray(buf), jnp.asarray(mask), tpad, pooling))
        return out[0, :n] if pooling == "none" else out[0]

    @property
    def has_rank_head(self) -> bool:
        """True when the model carries a rerank classification head
        (cls / cls.output tensors — reference pooling_type RANK)."""
        return "cls" in self.params or "cls_output" in self.params

    def rank(self, tokens: list[int]) -> float:
        """Cross-encoder relevance score for one query+document sequence."""
        if self._builder != "encoder" or not self.has_rank_head:
            raise ValueError("model has no rerank classification head")
        return float(np.asarray(self._encode(tokens, "rank")).reshape(-1)[0])

    def embed(self, tokens: list[int], pooling: str | None = None) -> np.ndarray:
        """Hidden-state embedding with pooling (mean | last | cls); default
        comes from the GGUF pooling_type when present."""
        pooling = pooling or getattr(self.cfg, "pooling", "") or "mean"
        if getattr(self, "_builder", "decoder") == "encoder":
            return self._encode(tokens, pooling)
        if not hasattr(self, "_embed_fn"):
            @partial(jax.jit, static_argnames=("t",))
            def _embed(params, toks, t):
                positions = jnp.arange(t, dtype=jnp.int32)[None, :]
                mask = jnp.tril(jnp.ones((1, t, t), bool))
                hidden, _ = forward(
                    params, self.cfg, toks, positions, None, 0, mask,
                    compute_dtype=self.compute_dtype, return_hidden=True,
                )
                return hidden

            self._embed_fn = _embed
        n = len(tokens)
        tpad = self._bucket(n)
        if tpad < n:  # longer than the largest bucket: round up
            tpad = -(-n // tpad) * tpad
        buf = np.zeros((1, tpad), np.int32)
        buf[0, :n] = tokens
        hidden = np.asarray(
            self._embed_fn(self.params, jnp.asarray(buf), tpad)
        )[0, :n]  # [n, C]
        if pooling == "last":
            vec = hidden[-1]
        elif pooling == "cls":
            vec = hidden[0]
        else:
            vec = hidden.mean(axis=0)
        return vec

    # -- LoRA hot-swap (reference server /lora-adapters) ---------------------
    def set_lora(self, adapter, scale: float = 1.0) -> None:
        """Apply (or with adapter=None, remove) a LoRA adapter in place."""
        from .adapter import apply_lora, strip_lora

        params = strip_lora(self.params)
        if adapter is not None:
            params = apply_lora(params, adapter, scale)
        self.params = jax.tree.map(jnp.asarray, params)

    @property
    def n_busy_slots(self) -> int:
        return sum(1 for s in self.slots if s.state != SlotState.FREE)


def _slot_mask(positions, capacity: int, n_past):
    """[B, T] positions → [B, T, S] causal mask over each slot's own rows.

    j <= pos suffices: slot rows are always written contiguously from 0, so
    rows at j <= pos always belong to the slot's current sequence."""
    j = jnp.arange(capacity)
    return j[None, None, :] <= positions[:, :, None]
