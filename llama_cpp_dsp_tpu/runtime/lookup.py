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


class Lookahead2D:
    """Full 2-D lookahead decoding — the lmsys algorithm as implemented by
    the reference (examples/lookahead/lookahead.cpp:49,181-260): a W-column
    lookahead window over N-1 Jacobi levels plus up to G verification
    n-gram branches, all evaluated in ONE batch per step.

    TPU-native mapping: the reference expresses branch structure through
    multi-sequence KV cells (seq 0 = input, 1..W = window columns,
    W+1..W+G = verification branches) and the kq_mask built from them.
    Here the whole batch is written at contiguous cache rows
    n_past..n_past+P-1 (row ≠ position), the branch structure is an
    explicit [P, capacity] attention mask built from seq bitsets
    (ctx.eval_tree), and acceptance keeps rows via a gather
    (ctx.gather_rows — role of llama_kv_self_seq_keep/seq_cp). P is fixed
    at 1 + G*(N-1) + (W-1) + W*(N-2), so the step compiles once: inactive
    verification slots are mask-isolated padding rather than a shape
    change (XLA static-shape rule)."""

    def __init__(self, ctx: LlamaContext, *, w: int = 15, n: int = 5,
                 g: int = 15):
        assert n >= 2 and w >= 2
        self.ctx = ctx
        self.w, self.n, self.g = w, n, g
        self.stats = LookupStats()
        # ring buffer of (N-1)-grams per first token (ngram_container role,
        # lookahead.cpp:23-37): {first_token: [(t1..tN-1), ...] (≤ G)}
        self.pool: dict[int, list[tuple[int, ...]]] = {}
        self._batch_size = 1 + g * (n - 1) + (w - 1) + w * (n - 2)

    # batch layout ----------------------------------------------------------
    # 0                         : input token
    # 1 + j*G + g               : verification branch g, ngram token j+1
    #                             (j = 0..N-2; j-major like the reference)
    # V + i - 1  (V = 1+G*(N-1)): level-0 window, columns i = 1..W-1
    # V + (W-1) + (j-1)*W + i   : level-j window (j = 1..N-2), column i
    def _i_verif(self, gi: int, j: int) -> int:
        return 1 + (j - 1) * self.g + gi  # ngram token j (1-based)

    def _i_level(self, j: int, i: int) -> int:
        v = 1 + self.g * (self.n - 1)
        if j == 0:
            return v + i - 1
        return v + (self.w - 1) + (j - 1) * self.w + i

    def _build_batch(self, id0: int, base: int, tokens_j, ngrams):
        w, n, g = self.w, self.n, self.g
        p = self._batch_size
        toks = np.zeros(p, np.int64)
        pos = np.full(p, base, np.int64)
        bits = np.zeros(p, np.int64)  # seq-membership bitsets
        prim = np.zeros(p, np.int64)  # primary seq per entry
        all_bits = (1 << (w + g + 1)) - 1
        toks[0], bits[0], prim[0] = id0, all_bits, 0
        for gi, ng in enumerate(ngrams):
            for j in range(1, n):
                e = self._i_verif(gi, j)
                toks[e] = ng[j - 1]
                pos[e] = base + j
                bits[e] = 1 << (w + 1 + gi)
                prim[e] = w + 1 + gi
        for i in range(1, w):  # level 0 belongs to columns i..W-1
            e = self._i_level(0, i)
            toks[e] = tokens_j[0][i]
            pos[e] = base + i
            bits[e] = sum(1 << (c + 1) for c in range(i, w))
            prim[e] = i + 1
        for j in range(1, n - 1):
            for i in range(w):
                e = self._i_level(j, i)
                toks[e] = tokens_j[j][i]
                pos[e] = base + j + i
                bits[e] = 1 << (i + 1)
                prim[e] = i + 1
        # mask over cache rows: committed prefix + same-branch causal
        cap = self.ctx.n_ctx
        mask = np.zeros((p, cap), bool)
        mask[:, :base] = True
        vis = ((bits[None, :] >> prim[:, None]) & 1).astype(bool)
        vis &= pos[None, :] <= pos[:, None]
        mask[:, base : base + p] = vis
        # inactive verification slots: bits == 0 → vis row/col all-False
        # except we must avoid all-masked softmax rows → allow prefix only
        # (already true via mask[:, :base]); their outputs are never read
        return toks.astype(np.int32), pos.astype(np.int32), mask

    def _pool_add(self, first: int, ngram: tuple[int, ...]) -> None:
        cur = self.pool.setdefault(first, [])
        if ngram in cur:
            return
        cur.append(ngram)
        if len(cur) > self.g:
            cur.pop(0)

    def generate(self, prompt_tokens, *, max_new_tokens=128, sampler=None,
                 stop_on_eog=True):
        from .sampling import Greedy, SamplerChain as SC

        sampler = sampler or SC([Greedy()])
        ctx = self.ctx
        w, n, g = self.w, self.n, self.g
        all_tokens = list(prompt_tokens)
        logits = ctx.eval_tokens(list(prompt_tokens))
        token = sampler.sample(logits)
        yield token
        produced = 1
        all_tokens.append(token)
        if stop_on_eog and ctx.vocab is not None and ctx.vocab.is_eog(token):
            return

        # window init: cycle prompt tokens (reference offers random-from-
        # prompt or 100+i; prompt cycling is the deterministic variant)
        src = all_tokens[1:] or [token]
        tokens_j = [[src[(j * w + i) % len(src)] for i in range(w)]
                    for j in range(n - 1)]

        while produced < max_new_tokens:
            base = ctx.n_past
            if base + self._batch_size + 1 > ctx.n_ctx:
                return
            ngrams = [ng for ng in self.pool.get(token, [])][: g]
            self.stats.n_drafted += len(ngrams) * (n - 1)
            toks, pos, mask = self._build_batch(token, base, tokens_j, ngrams)
            logits = ctx.eval_tree(toks, pos, mask)

            active = [True] * len(ngrams)
            kept_rows: list[int] = []
            stop = False
            for v in range(n):
                if v > 0:
                    gi = next((i for i, a in enumerate(active) if a), None)
                    if gi is None:
                        break
                    i_batch = self._i_verif(gi, v)
                    kept_rows.append(base + i_batch)
                    self.stats.n_accepted += 1
                else:
                    i_batch = 0
                token = sampler.sample(logits[i_batch])
                yield token
                produced += 1
                all_tokens.append(token)
                if stop_on_eog and ctx.vocab is not None \
                        and ctx.vocab.is_eog(token):
                    stop = True
                    break
                if produced >= max_new_tokens:
                    stop = True
                    break
                # verification: drop branches whose next token mismatches
                for i, ng in enumerate(ngrams):
                    if active[i]:
                        active[i] = v < n - 1 and ng[v] == token
                # window shift (reference lookahead.cpp:351-378)
                prev_l0 = list(tokens_j[0])
                for j in range(n - 2):
                    tokens_j[j] = tokens_j[j + 1]
                if v == 0:
                    # window guesses: sample WITHOUT accept (they are
                    # speculative — reference samples them with no
                    # common_sampler_accept)
                    tokens_j[n - 2] = [
                        sampler.peek(logits[self._i_level(n - 2, i)])
                        for i in range(w)]
                else:
                    tokens_j[n - 2] = list(tokens_j[0])
                # harvest window n-grams (only on the first iteration)
                if v == 0:
                    for f in range(w):
                        self._pool_add(
                            prev_l0[f],
                            tuple(tokens_j[j][f] for j in range(n - 1)))

            # KV management: keep input row (already at `base`) + accepted
            # branch rows compacted right after it; drop the rest
            if kept_rows:
                ctx.gather_rows(base + 1, kept_rows)
                ctx.rollback_to(base + 1 + len(kept_rows))
            else:
                ctx.rollback_to(base + 1)
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
