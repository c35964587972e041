"""Decode engine — capability mirror of llama_context (src/llama-context.cpp).

Owns device params + KV cache, jit-compiled prefill/decode step functions
with shape bucketing (fixed-shape ubatches avoid recompilation, replacing
the reference's per-graph alloc/sched), and the generate loop that drives
the host-side sampler chain.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Iterator
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import forward
from .kv_cache import KVCache, causal_mask
from .loader import LoadedModel
from .sampling import SamplerChain

log = logging.getLogger(__name__)


def _bucket(n: int, buckets: list[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def convert_params_to_kernel(params: dict) -> dict:
    """Swap matmul QTensors for fused-kernel layouts (token_embd stays a
    QTensor: it feeds the packed row-gather; expert tensors become
    expert-axis KernelWeights for the MUL_MAT_ID kernel). QKV and gate/up
    pairs are row-fused into single kernel calls to amortize per-launch
    overhead (the reference gets this for free from CUDA graphs; here
    fewer, larger Pallas calls serve the same role)."""
    from ..ops.pallas.layouts import (
        concat_qtensors, to_kernel_layout, to_kernel_layout_experts,
    )
    from ..ops.pallas.qmm import SUPPORTED_KINDS
    from ..ops.qtensor import QTensor

    def fusable(layer, names):
        if any(f"{nm}_lora_a" in layer for nm in names):
            return None  # LoRA deltas attach per-weight; keep them separate
        ws = [layer.get(nm) for nm in names]
        return ws if all(
            isinstance(w, QTensor) and w.kind in SUPPORTED_KINDS and not w.n_expert
            for w in ws
        ) else None

    def conv(leaf):
        if isinstance(leaf, QTensor) and leaf.kind in SUPPORTED_KINDS:
            if leaf.n_expert:
                return to_kernel_layout_experts(leaf)
            return to_kernel_layout(leaf)
        return leaf

    import os

    from ..gguf.constants import GGMLType

    params = dict(params)
    new_layers = []
    for layer in params["layers"]:
        layer = dict(layer)
        for fused_key, names in (
            ("attn_qkv_fused", ("attn_q", "attn_k", "attn_v")),
            ("ffn_gateup_fused", ("ffn_gate", "ffn_up")),
        ):
            ws = fusable(layer, names)
            if ws is None:
                continue
            cat = concat_qtensors(ws)
            if cat is None:
                continue
            kw = to_kernel_layout(cat)
            kw.sections = tuple(w.shape[0] for w in ws)
            layer[fused_key] = kw
            for nm in names:
                del layer[nm]
        new_layers.append({k: conv(v) for k, v in layer.items()})
    params["layers"] = new_layers
    if "output" in params and params["output"] is not None:
        params["output"] = conv(params["output"])
    return params


def _convert_to_kernel_weights(model: LoadedModel) -> LoadedModel:
    import dataclasses

    return dataclasses.replace(
        model, params=convert_params_to_kernel(model.params)
    )


@dataclass
class PerfCounters:
    """llama_perf_context-style counters (reference include/llama.h:1403)."""

    t_load_ms: float = 0.0
    t_prefill_ms: float = 0.0
    t_decode_ms: float = 0.0
    t_compile_ms: float = 0.0  # first-eval-per-shape (XLA compile) time
    n_prefill: int = 0
    n_decode: int = 0

    def report(self) -> str:
        pp = self.n_prefill / self.t_prefill_ms * 1000 if self.t_prefill_ms else 0
        tg = self.n_decode / self.t_decode_ms * 1000 if self.t_decode_ms else 0
        return (
            f"prefill: {self.n_prefill} tok in {self.t_prefill_ms:.1f} ms ({pp:.2f} t/s) | "
            f"decode: {self.n_decode} tok in {self.t_decode_ms:.1f} ms ({tg:.2f} t/s) | "
            f"compile: {self.t_compile_ms:.1f} ms"
        )


class LlamaContext:
    def __init__(
        self,
        model: LoadedModel,
        *,
        n_ctx: int = 2048,
        n_batch: int = 1,
        compute_dtype=jnp.bfloat16,
        kv_dtype="bf16",  # 'f32'|'bf16'|'f16'|'q8_0'|'q4_0'|'q4_1' — -ctk
        kv_v_dtype=None,  # V-cache type when different from K (-ctv,
        # reference common/arg.cpp:699); mixed pairs run the XLA attn path
        prefill_buckets: tuple[int, ...] = (32, 128, 512, 2048),
        device=None,
        use_pallas: bool | None = None,
        tp: int = 1,  # tensor-parallel over a ("dp","tp") mesh — the
        # TPU-native split-mode ROW (parallel/sharding.py); GSPMD inserts
        # the ICI collectives. Forces the XLA compute path (pallas_call is
        # not GSPMD-partitionable).
    ):
        t0 = time.perf_counter()
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform == "tpu" and tp <= 1
        if tp > 1 and use_pallas:
            log.warning("tensor-parallel forces the XLA path (use_pallas off)")
            use_pallas = False
        if use_pallas:
            model = _convert_to_kernel_weights(model)
        self.cfg = model.cfg
        self.vocab = model.vocab
        self.tokenizer = model.tokenizer
        self.n_ctx = min(n_ctx, 1 << 30)
        self.n_batch = n_batch
        self.compute_dtype = compute_dtype
        self.prefill_buckets = [b for b in prefill_buckets if b <= self.n_ctx] or [self.n_ctx]
        self._mesh = None
        if tp > 1:
            from ..parallel.sharding import (
                ShardingConfig, make_mesh, shard_params,
            )

            self._mesh = make_mesh(ShardingConfig(tp=tp, dp=1))
            self.params = shard_params(model.params, self.cfg, self._mesh)
        elif device is not None:
            self.params = jax.device_put(model.params, device)
        else:
            self.params = jax.tree.map(jnp.asarray, model.params)
        from .kv_cache import make_kv_cache

        if not isinstance(kv_dtype, str):
            kv_dtype = {jnp.float32: "f32", jnp.bfloat16: "bf16",
                        jnp.float16: "f16"}.get(kv_dtype, "bf16")
        self.cache = make_kv_cache(
            self.cfg.n_layers, n_batch, self.n_ctx, self.cfg.kv_cache_heads,
            self.cfg.kv_cache_dim, kv_dtype, v_type=kv_v_dtype,
        )
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import cache_sharding

            heads = self.cfg.kv_cache_heads
            sh = (cache_sharding(self._mesh) if heads % tp == 0
                  else NamedSharding(self._mesh, P()))  # replicate odd heads
            self.cache = jax.tree.map(lambda a: jax.device_put(a, sh),
                                      self.cache)
        self.n_past = 0
        self.pos_delta = 0  # rope position − cache row (self-extend)
        self.perf = PerfCounters()
        use_flash = use_pallas  # MLA now has its own fused decode path

        @partial(jax.jit, donate_argnums=(1,))
        def _step(params, cache, tokens, positions, n_past, pos_delta):
            # `positions` are cache-row indices (mask + flash lengths);
            # rope uses rows + pos_delta (≠0 only after self-extend seq_div)
            mask = causal_mask(positions, cache.capacity, n_past)
            logits, cache = forward(
                params, self.cfg, tokens, positions, cache, n_past, mask,
                compute_dtype=compute_dtype, flash=use_flash,
                rope_positions=positions + pos_delta,
            )
            return logits, cache

        self._step = _step

        @partial(jax.jit, donate_argnums=(1,))
        def _step_embd(params, cache, embd, positions, n_past, pos_delta):
            mask = causal_mask(positions, cache.capacity, n_past)
            tokens = jnp.zeros(positions.shape, jnp.int32)
            logits, cache = forward(
                params, self.cfg, tokens, positions, cache, n_past, mask,
                compute_dtype=compute_dtype, flash=use_flash,
                rope_positions=positions + pos_delta, input_embd=embd,
            )
            return logits, cache

        self._step_embd = _step_embd

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("top_k",))
        def _step_sample(params, cache, tokens, positions, n_past, pos_delta,
                         key, temp, top_p, min_p, *, top_k):
            """Fused decode + on-device sampling: only the token id leaves
            the device (the reference pulls full logits per token —
            ops/device_sampling.py rationale)."""
            from ..ops.device_sampling import sample_logits

            mask = causal_mask(positions, cache.capacity, n_past)
            logits, cache = forward(
                params, self.cfg, tokens, positions, cache, n_past, mask,
                compute_dtype=compute_dtype, flash=use_flash,
                rope_positions=positions + pos_delta,
            )
            tok = sample_logits(logits[:, -1, :], key, temp, top_k=top_k,
                                top_p=top_p, min_p=min_p)
            return tok[0], cache

        self._step_sample = _step_sample

        @partial(jax.jit, donate_argnums=(1,),
                 static_argnames=("top_k", "chunk"))
        def _step_sample_chunk(params, cache, token, n_past, pos_delta, key,
                               temp, top_p, min_p, *, top_k, chunk):
            """`chunk` fused decode+sample steps in ONE dispatch (lax.scan
            feeding each sampled token back as the next input): amortizes
            the ~1 ms/token host→device round-trip of per-token dispatch
            over `chunk` tokens; only [chunk] int32 ids leave the device.
            The reference's loop is llama_decode + host sampler per token
            (examples/main/main.cpp) — here the whole inner loop lives on
            device. Caveats vs the single-step path: the key stream differs
            (keys split inside the scan), and XLA fuses the scan body
            slightly differently per static `chunk`, so logits can move by
            ~1 bf16 ulp — greedy picks are identical except at sub-ulp
            logit ties (the same class of variation as toggling flash
            attention in the reference). Output is deterministic for a
            fixed chunk size."""
            from ..ops.device_sampling import sample_logits

            def body(carry, _):
                cache, tok, p, key = carry
                key, sub = jax.random.split(key)
                pos = jnp.reshape(p, (1, 1)).astype(jnp.int32)
                mask = causal_mask(pos, cache.capacity, p)
                logits, cache = forward(
                    params, self.cfg, jnp.reshape(tok, (1, 1)), pos, cache,
                    p, mask, compute_dtype=compute_dtype, flash=use_flash,
                    rope_positions=pos + pos_delta,
                )
                nxt = sample_logits(logits[:, -1, :], sub, temp, top_k=top_k,
                                    top_p=top_p, min_p=min_p)[0]
                return (cache, nxt, p + 1, key), nxt

            (cache, _, _, _), toks = jax.lax.scan(
                body, (cache, jnp.int32(token), jnp.int32(n_past), key),
                None, length=chunk)
            return toks, cache

        self._step_sample_chunk = _step_sample_chunk
        self._seen_shapes: set[int] = set()
        self._tree_steps: dict = {}  # P → jitted tree-attention step
        self.perf.t_load_ms = (time.perf_counter() - t0) * 1000

    # -- core ---------------------------------------------------------------
    def reset(self) -> None:
        self.n_past = 0
        self.pos_delta = 0

    def eval_tokens_all(self, tokens: list[int]) -> np.ndarray:
        """Feed tokens; returns logits for EVERY position [n, vocab]
        (the speculative verifier needs n_draft+1 logits)."""
        n = len(tokens)
        if self.n_past + n > self.n_ctx:
            raise RuntimeError(f"context overflow: {self.n_past}+{n} > {self.n_ctx}")
        tpad = _bucket(n, self.prefill_buckets)
        if tpad < n:
            outs = [self.eval_tokens_all(tokens[i : i + tpad]) for i in range(0, n, tpad)]
            return np.concatenate(outs, axis=0)
        toks = np.zeros((1, tpad), np.int32)
        toks[0, :n] = tokens
        pos = np.full((1, tpad), self.n_past, np.int32)
        pos[0, :n] = self.n_past + np.arange(n)
        logits, self.cache = self._step(
            self.params, self.cache, jnp.asarray(toks), jnp.asarray(pos),
            jnp.int32(self.n_past), jnp.int32(self.pos_delta),
        )
        out = np.asarray(logits[0, :n])
        self.n_past += n
        return out

    def eval_embd(self, embd: np.ndarray) -> np.ndarray:
        """Feed raw input embeddings [T, n_embd] (llava image patches —
        reference llava_eval_image_embed, examples/llava/llava.cpp); returns
        logits of the last row [vocab]."""
        n = embd.shape[0]
        if self.n_past + n > self.n_ctx:
            raise RuntimeError(f"context overflow: {self.n_past}+{n} > {self.n_ctx}")
        tpad = _bucket(n, self.prefill_buckets)
        if tpad < n:
            out = None
            for i in range(0, n, tpad):
                out = self.eval_embd(embd[i : i + tpad])
            return out
        buf = np.zeros((1, tpad, embd.shape[1]), np.float32)
        buf[0, :n] = embd
        pos = np.full((1, tpad), self.n_past, np.int32)
        pos[0, :n] = self.n_past + np.arange(n)
        logits, self.cache = self._step_embd(
            self.params, self.cache, jnp.asarray(buf), jnp.asarray(pos),
            jnp.int32(self.n_past), jnp.int32(self.pos_delta),
        )
        out = np.asarray(logits[0, n - 1])
        self.n_past += n
        return out

    def _eval_sample_token(self, token: int, key, spec: dict) -> int:
        """Feed `token`, sample the next one ON DEVICE (fused step; see
        generate). Returns the sampled id; updates perf like eval_tokens."""
        if self.n_past + 1 > self.n_ctx:
            raise RuntimeError(f"context overflow at {self.n_past}")
        t0 = time.perf_counter()
        first = "sample1" not in self._seen_shapes
        self._seen_shapes.add("sample1")
        tok, self.cache = self._step_sample(
            self.params, self.cache,
            jnp.asarray([[token]], dtype=jnp.int32),
            jnp.asarray([[self.n_past]], dtype=jnp.int32),
            jnp.int32(self.n_past), jnp.int32(self.pos_delta), key,
            jnp.float32(spec["temp"]), jnp.float32(spec["top_p"]),
            jnp.float32(spec["min_p"]), top_k=spec["top_k"],
        )
        out = int(tok)
        self.n_past += 1
        dt = (time.perf_counter() - t0) * 1000
        if first:
            self.perf.t_compile_ms += dt
        else:
            self.perf.t_decode_ms += dt
            self.perf.n_decode += 1
        return out

    def _eval_sample_chunk(self, token: int, key, spec: dict,
                           chunk: int) -> list[int]:
        """Feed `token` and run `chunk` fused decode+sample steps in one
        dispatch; returns the `chunk` sampled ids. Does NOT advance n_past —
        the caller advances one row per CONSUMED token, so breaking out
        mid-chunk (EOG, stop string, caller closing the generator) leaves
        n_past exactly where the single-step path would have: overshoot rows
        sit beyond n_past, unattendable, and are overwritten on the next
        feed (the rollback_to invariant)."""
        if self.n_past + chunk > self.n_ctx:
            raise RuntimeError(f"context overflow at {self.n_past}+{chunk}")
        t0 = time.perf_counter()
        shape_key = ("chunk", chunk)
        first = shape_key not in self._seen_shapes
        self._seen_shapes.add(shape_key)
        toks, self.cache = self._step_sample_chunk(
            self.params, self.cache, token, self.n_past, self.pos_delta,
            key, jnp.float32(spec["temp"]), jnp.float32(spec["top_p"]),
            jnp.float32(spec["min_p"]), top_k=spec["top_k"], chunk=chunk,
        )
        out = [int(t) for t in np.asarray(toks)]
        dt = (time.perf_counter() - t0) * 1000
        if first:
            self.perf.t_compile_ms += dt
        else:
            self.perf.t_decode_ms += dt
            self.perf.n_decode += chunk
        return out

    def context_shift(self, n_keep: int, n_discard: int) -> None:
        """Evict n_discard cells after the first n_keep and rebase positions —
        the reference's context-shift (examples/main/main.cpp:619: seq_rm +
        seq_add applied lazily as a K-shift rope graph)."""
        from .cache_ops import apply_seq_edit, context_shift_indices

        assert n_keep + n_discard <= self.n_past, (n_keep, n_discard, self.n_past)
        src, deltas = context_shift_indices(self.n_ctx, n_keep, n_discard)
        ff = self.params["layers"][0].get("rope_freqs")
        self.cache = apply_seq_edit(self.cache, src, deltas, self.cfg.rope, ff)
        self.n_past -= n_discard

    def self_extend(self, ga_i: int, ga_n: int, ga_w: int) -> int:
        """Grouped self-extend position division (examples/main/main.cpp:
        481-520 seq_add/seq_div dance). Returns the position shrinkage."""
        from .cache_ops import apply_seq_edit, self_extend_indices

        src, deltas = self_extend_indices(self.n_ctx, self.n_past, ga_i, ga_n, ga_w)
        ff = self.params["layers"][0].get("rope_freqs")
        self.cache = apply_seq_edit(self.cache, src, deltas, self.cfg.rope, ff)
        shrink = ga_w - ga_w // ga_n
        self.pos_delta -= shrink  # rows stay; only rope positions compress
        return shrink

    def rollback_to(self, n_past: int) -> None:
        """Drop cache entries beyond n_past (rejected draft tokens). Rows are
        overwritten before becoming attendable, so only the counter moves —
        the transactional guard of the reference's kv commit/restore."""
        assert 0 <= n_past <= self.n_past
        self.n_past = n_past

    def eval_tree(self, tokens, positions, mask) -> np.ndarray:
        """Tree-attention batch (lookahead decoding / branchy speculation):
        `tokens` [P] are written at cache ROWS n_past..n_past+P-1 while
        carrying arbitrary `positions` [P] (rope angles — row ≠ position
        here) and an explicit bool `mask` [P, capacity] over cache rows.
        This is the TPU-native form of the reference's multi-sequence
        llama_batch + kq_mask (llm_graph_input_attn_kv_unified::set_input):
        branch structure lives in the mask, not in per-cell seq-id sets.
        Returns ALL logits [P, V] f32; n_past advances by P — the caller
        keeps the accepted prefix with gather_rows + rollback_to."""
        p = len(tokens)
        if self.n_past + p > self.n_ctx:
            raise RuntimeError(f"context overflow: {self.n_past}+{p} > {self.n_ctx}")
        step = self._tree_steps.get(p)
        if step is None:
            @partial(jax.jit, donate_argnums=(1,))
            def step(params, cache, toks, pos, n_past, mask):
                logits, cache = forward(
                    params, self.cfg, toks, pos, cache, n_past, mask[None],
                    compute_dtype=self.compute_dtype,
                )
                return logits, cache

            self._tree_steps[p] = step
        t0 = time.perf_counter()
        logits, self.cache = step(
            self.params, self.cache, jnp.asarray(tokens, jnp.int32)[None],
            jnp.asarray(positions, jnp.int32)[None], jnp.int32(self.n_past),
            jnp.asarray(mask, bool),
        )
        out = np.asarray(logits[0])
        self.perf.t_prefill_ms += (time.perf_counter() - t0) * 1000
        self.perf.n_prefill += p
        self.n_past += p
        return out

    def gather_rows(self, dst_start: int, src_rows: list[int]) -> None:
        """Move cache rows src_rows → dst_start.. (accepted branch
        compaction; role of the reference's llama_kv_self_seq_keep +
        seq_cp after lookahead verification). Rope is NOT re-rotated: the
        rows' positions already equal their destination rows."""
        from .cache_ops import apply_seq_edit

        src = np.arange(self.n_ctx, dtype=np.int32)
        src[dst_start : dst_start + len(src_rows)] = src_rows
        deltas = np.zeros(self.n_ctx, np.int32)
        ff = self.params["layers"][0].get("rope_freqs")
        self.cache = apply_seq_edit(
            self.cache, jnp.asarray(src)[None], jnp.asarray(deltas)[None],
            self.cfg.rope, ff)

    def eval_tokens(self, tokens: list[int]) -> np.ndarray:
        """Feed tokens at the current position; returns logits of the LAST
        real token [vocab]."""
        n = len(tokens)
        if n == 0:
            raise ValueError("empty token batch")
        if self.n_past + n > self.n_ctx:
            raise RuntimeError(f"context overflow: {self.n_past}+{n} > {self.n_ctx}")
        t0 = time.perf_counter()
        if n == 1:
            first = 1 not in self._seen_shapes
            self._seen_shapes.add(1)
            buf_t = jnp.asarray([[tokens[0]]], dtype=jnp.int32)
            buf_p = jnp.asarray([[self.n_past]], dtype=jnp.int32)
            logits, self.cache = self._step(self.params, self.cache, buf_t, buf_p,
                                            jnp.int32(self.n_past),
                                            jnp.int32(self.pos_delta))
            out = np.asarray(logits[0, 0])
            dt = (time.perf_counter() - t0) * 1000
            if first:
                self.perf.t_compile_ms += dt
            else:
                self.perf.t_decode_ms += dt
                self.perf.n_decode += 1
        else:
            tpad = _bucket(n, self.prefill_buckets)
            if tpad < n:
                # chunked prefill for long prompts
                out = None
                for i in range(0, n, tpad):
                    out = self.eval_tokens(tokens[i : i + tpad])
                return out
            first = tpad not in self._seen_shapes
            self._seen_shapes.add(tpad)
            toks = np.zeros((1, tpad), np.int32)
            toks[0, :n] = tokens
            pos = np.full((1, tpad), self.n_past, np.int32)
            pos[0, :n] = self.n_past + np.arange(n)
            logits, self.cache = self._step(
                self.params, self.cache, jnp.asarray(toks), jnp.asarray(pos),
                jnp.int32(self.n_past), jnp.int32(self.pos_delta),
            )
            out = np.asarray(logits[0, n - 1])
            dt = (time.perf_counter() - t0) * 1000
            if first:
                self.perf.t_compile_ms += dt
            else:
                self.perf.t_prefill_ms += dt
                self.perf.n_prefill += n
        self.n_past += n
        return out

    # -- generation ----------------------------------------------------------
    def generate(
        self,
        prompt_tokens: list[int],
        *,
        max_new_tokens: int = 128,
        sampler: SamplerChain | None = None,
        stop_on_eog: bool = True,
        context_shift: bool = True,
        n_keep: int = 0,
        ga_n: int = 1,  # self-extend group factor (reference --grp-attn-n)
        ga_w: int = 512,  # self-extend window (reference --grp-attn-w)
    ) -> Iterator[int]:
        from .sampling import Greedy, SamplerChain as SC

        sampler = sampler or SC([Greedy()])
        # stateless default chains sample ON DEVICE fused with the decode
        # step: a 4-byte token id replaces the [V]-float logits pull
        spec = getattr(sampler, "device_spec", None)
        dev_key = None
        chunk = 1
        if spec is not None:
            import os

            import jax

            dev_key = jax.random.PRNGKey(int(sampler.rng.integers(1 << 31)))
            # multi-token dispatch: amortize the host round-trip over a
            # lax.scan of fused decode+sample steps (off when self-extend
            # rewrites positions mid-stream)
            if ga_n == 1:
                chunk = max(1, int(os.environ.get("LLAMA_TPU_DECODE_CHUNK",
                                                  "8")))
        pending: list[int] = []
        ga_i = 0
        logits = self.eval_tokens(list(prompt_tokens))
        token = sampler.sample(logits)  # first token: host (prefill logits)
        for step in range(max_new_tokens):
            yield token
            if step + 1 >= max_new_tokens:
                return
            if stop_on_eog and self.vocab is not None and self.vocab.is_eog(token):
                return
            if ga_n > 1:
                # self-extend: compress positions whenever the window fills
                # (examples/main/main.cpp:481-520)
                while self.n_past + self.pos_delta >= ga_i + ga_w:
                    self.self_extend(ga_i, ga_n, ga_w)
                    ga_i += ga_w // ga_n
            if self.n_past >= self.n_ctx:
                if not context_shift:
                    return
                # evict half the non-kept context (examples/main/main.cpp:619)
                n_discard = max(1, (self.n_ctx - n_keep) // 2)
                self.context_shift(n_keep, n_discard)
            if pending:
                self.n_past += 1  # the consumed token's row was pre-written
                token = pending.pop(0)
            elif spec is not None:
                import jax

                dev_key, sub = jax.random.split(dev_key)
                if chunk > 1 and self.n_past + chunk <= self.n_ctx:
                    toks = self._eval_sample_chunk(token, sub, spec, chunk)
                    self.n_past += 1
                    token, pending = toks[0], toks[1:]
                else:
                    token = self._eval_sample_token(token, sub, spec)
            else:
                logits = self.eval_tokens([token])
                token = sampler.sample(logits)
