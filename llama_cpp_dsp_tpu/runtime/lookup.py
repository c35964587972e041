"""N-gram cache + lookup decoding (model-free speculation).

Capability mirror of reference common/ngram-cache.{h,cpp} and
examples/lookup/lookup.cpp: drafts are proposed from n-gram statistics of
previously seen text (context + optional static/dynamic caches) instead of
a draft model; the target verifies the draft batch exactly like speculative
decoding. The verify path reuses LlamaContext.eval_tokens_all + rollback.

Cache files use a simple JSON-lines format (the reference uses a binary
dump; the capability is save/merge/load of n-gram statistics).
"""

from __future__ import annotations

import json
from collections import Counter, defaultdict
from dataclasses import dataclass, field

import numpy as np

from .context import LlamaContext
from .sampling import SamplerChain

# reference common/ngram-cache.h: LLAMA_NGRAM_MIN/MAX
NGRAM_MIN = 1
NGRAM_MAX = 4


@dataclass
class NgramCache:
    """ngram (tuple) → Counter of successor tokens."""

    parts: dict[int, dict[tuple, Counter]] = field(
        default_factory=lambda: {n: defaultdict(Counter) for n in
                                 range(NGRAM_MIN, NGRAM_MAX + 1)}
    )

    def update(self, tokens: list[int], ngram_min: int = NGRAM_MIN,
               ngram_max: int = NGRAM_MAX, n_new: int | None = None) -> None:
        """common_ngram_cache_update: index the last n_new tokens."""
        t = list(tokens)
        start = 0 if n_new is None else max(0, len(t) - n_new - ngram_max)
        for n in range(ngram_min, ngram_max + 1):
            for i in range(start, len(t) - n):
                key = tuple(t[i : i + n])
                self.parts[n][key][t[i + n]] += 1

    def _sample_next(self, key: tuple, strict: bool) -> int | None:
        """common_ngram_cache_get_token deterministic variant: the majority
        successor, requiring dominance when strict."""
        n = len(key)
        counter = self.parts.get(n, {}).get(key)
        if not counter:
            return None
        (tok, cnt), total = counter.most_common(1)[0], sum(counter.values())
        if strict and (cnt < 2 or cnt * 2 < total):
            return None
        return tok

    def draft(self, tokens: list[int], n_draft: int) -> list[int]:
        """common_ngram_cache_draft: greedily extend using the largest
        matching n-gram at each step."""
        out: list[int] = []
        ctx = list(tokens)
        for _ in range(n_draft):
            nxt = None
            for n in range(NGRAM_MAX, NGRAM_MIN - 1, -1):
                if len(ctx) < n:
                    continue
                nxt = self._sample_next(tuple(ctx[-n:]), strict=(n < 2))
                if nxt is not None:
                    break
            if nxt is None:
                break
            out.append(nxt)
            ctx.append(nxt)
        return out

    def merge(self, other: "NgramCache") -> None:
        """common_ngram_cache_merge."""
        for n, table in other.parts.items():
            for key, counter in table.items():
                self.parts[n][key].update(counter)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            for n, table in self.parts.items():
                for key, counter in table.items():
                    f.write(json.dumps([list(key), dict(counter)]) + "\n")

    @classmethod
    def load(cls, path: str) -> "NgramCache":
        cache = cls()
        with open(path) as f:
            for line in f:
                key, counter = json.loads(line)
                key = tuple(key)
                cache.parts[len(key)][key].update(
                    {int(k): v for k, v in counter.items()})
        return cache


@dataclass
class LookupStats:
    n_drafted: int = 0
    n_accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.n_accepted / max(self.n_drafted, 1)


class LookupDecoder:
    """examples/lookup/lookup.cpp main loop: draft from the n-gram cache,
    verify a draft+1 batch on the target, accept the longest match."""

    def __init__(self, ctx: LlamaContext, *, n_draft: int = 8,
                 static_cache: NgramCache | None = None):
        self.ctx = ctx
        self.n_draft = n_draft
        self.cache = NgramCache()
        if static_cache is not None:
            self.cache.merge(static_cache)
        self.stats = LookupStats()

    def generate(self, prompt_tokens: list[int], *, max_new_tokens: int = 128,
                 sampler: SamplerChain | None = None, stop_on_eog: bool = True):
        from .sampling import Greedy, SamplerChain as SC

        sampler = sampler or SC([Greedy()])
        ctx = self.ctx
        all_tokens = list(prompt_tokens)
        self.cache.update(all_tokens)
        logits = ctx.eval_tokens(list(prompt_tokens))
        token = sampler.sample(logits)
        yield token
        produced = 1
        all_tokens.append(token)
        self.cache.update(all_tokens, n_new=1)
        if stop_on_eog and ctx.vocab is not None and ctx.vocab.is_eog(token):
            return

        while produced < max_new_tokens:
            room = min(max_new_tokens - produced, ctx.n_ctx - ctx.n_past - 2)
            if room <= 0:
                return
            draft = self.cache.draft(all_tokens, min(self.n_draft, room))
            self.stats.n_drafted += len(draft)
            base = ctx.n_past
            # one batch verifies [token, *draft]: logits[i] predicts the token
            # after consuming token+draft[:i] (examples/lookup/lookup.cpp loop)
            batch_logits = ctx.eval_tokens_all([token] + draft)
            accepted = 0
            stop = False
            for i in range(len(draft) + 1):
                t = sampler.sample(batch_logits[i])
                yield t
                produced += 1
                all_tokens.append(t)
                self.cache.update(all_tokens, n_new=1)
                token = t
                if stop_on_eog and ctx.vocab is not None and ctx.vocab.is_eog(t):
                    stop = True
                    break
                if produced >= max_new_tokens:
                    stop = True
                    break
                if i < len(draft) and t == draft[i]:
                    accepted += 1
                    continue
                break
            self.stats.n_accepted += accepted
            # keep rows for [token, accepted drafts]; drop the rejected tail
            ctx.rollback_to(base + 1 + accepted)
            if stop:
                return


class LookaheadDecoder(LookupDecoder):
    """Lookahead decoding (reference examples/lookahead/lookahead.cpp),
    expressed as Jacobi fixed-point iteration over a causal batch: each
    round verifies [token, *guesses]; the sampled tokens at rejected
    positions become the next round's guesses (one Jacobi step), and
    accepted trajectories feed the same n-gram pool the reference collects
    from its lookahead window. The reference's 2-D W×N window with custom
    attention masks is flattened to sequential rounds — same convergence
    behavior per accepted token, simpler masks (always causal).
    """

    def __init__(self, ctx: LlamaContext, *, n_draft: int = 8):
        super().__init__(ctx, n_draft=n_draft)
        self._jacobi: list[int] = []

    def _draft_tokens(self, all_tokens: list[int], room: int) -> list[int]:
        # n-gram pool first (reference checks its ngram container first),
        # falling back to the running Jacobi guesses
        draft = self.cache.draft(all_tokens, min(self.n_draft, room))
        if not draft:
            draft = self._jacobi[: min(self.n_draft, room)]
        return draft

    def generate(self, prompt_tokens, *, max_new_tokens=128, sampler=None,
                 stop_on_eog=True):
        from .sampling import Greedy, SamplerChain as SC

        sampler = sampler or SC([Greedy()])
        ctx = self.ctx
        all_tokens = list(prompt_tokens)
        self.cache.update(all_tokens)
        logits = ctx.eval_tokens(list(prompt_tokens))
        token = sampler.sample(logits)
        yield token
        produced = 1
        all_tokens.append(token)
        self.cache.update(all_tokens, n_new=1)
        if stop_on_eog and ctx.vocab is not None and ctx.vocab.is_eog(token):
            return

        while produced < max_new_tokens:
            room = min(max_new_tokens - produced, ctx.n_ctx - ctx.n_past - 2)
            if room <= 0:
                return
            draft = self._draft_tokens(all_tokens, room)
            self.stats.n_drafted += len(draft)
            base = ctx.n_past
            batch_logits = ctx.eval_tokens_all([token] + draft)
            accepted = 0
            stop = False
            sampled: list[int] = []
            for i in range(len(draft) + 1):
                t = sampler.sample(batch_logits[i])
                sampled.append(t)
                if i < len(draft) and t == draft[i]:
                    accepted += 1
                    continue
                break
            # Jacobi update: the freshly sampled tail (beyond acceptance)
            # seeds the next round's guesses
            self._jacobi = sampled[accepted + 1 :] + draft[accepted + 1 :][:0]
            for t in sampled[: accepted + 1]:
                yield t
                produced += 1
                all_tokens.append(t)
                self.cache.update(all_tokens, n_new=1)
                token = t
                if stop_on_eog and ctx.vocab is not None and ctx.vocab.is_eog(t):
                    stop = True
                    break
                if produced >= max_new_tokens:
                    stop = True
                    break
            self.stats.n_accepted += accepted
            ctx.rollback_to(base + 1 + accepted)
            if stop:
                return
