"""Sampler chain.

Capability mirror of reference src/llama-sampling.cpp (:472-2482): composable
samplers transforming a candidate array (ids, logits, probs). Runs host-side
on the final logits vector (the reference does the same on CPU); the decode
engine reduces to top-k on device first when the vocab is large.

Implemented: greedy, dist, top-k, top-p, min-p, typical, temp, temp-ext,
XTC, top-n-sigma, mirostat v1/v2, penalties, DRY, logit-bias. Grammar plugs
in via grammar.GrammarSampler (same apply/accept interface).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol

import numpy as np


@dataclass
class Candidates:
    ids: np.ndarray  # int32 [n]
    logits: np.ndarray  # float32 [n]
    probs: np.ndarray | None = None
    sorted: bool = False

    @classmethod
    def from_logits(cls, logits: np.ndarray) -> "Candidates":
        logits = np.asarray(logits, dtype=np.float32).reshape(-1)
        return cls(np.arange(len(logits), dtype=np.int32), logits.copy())

    def softmax(self) -> None:
        """llama_sampler_softmax_impl: sort desc + normalized probs."""
        if not self.sorted:
            order = np.argsort(-self.logits, kind="stable")
            self.ids = self.ids[order]
            self.logits = self.logits[order]
            self.sorted = True
        m = self.logits[0]
        p = np.exp(self.logits - m)
        self.probs = p / p.sum()

    def truncate(self, k: int) -> None:
        self.ids = self.ids[:k]
        self.logits = self.logits[:k]
        if self.probs is not None:
            self.probs = self.probs[:k]


class Sampler(Protocol):
    def apply(self, cand: Candidates, rng: np.random.Generator) -> int | None: ...
    def accept(self, token: int) -> None: ...
    def reset(self) -> None: ...


class _Stateless:
    def accept(self, token: int) -> None:
        pass

    def reset(self) -> None:
        pass


@dataclass
class Greedy(_Stateless):
    def apply(self, cand, rng):
        return int(cand.ids[int(np.argmax(cand.logits))])


@dataclass
class Dist(_Stateless):
    """Final sampler: draw from the softmax distribution."""

    def apply(self, cand, rng):
        cand.softmax()
        idx = rng.choice(len(cand.probs), p=cand.probs)
        return int(cand.ids[idx])


@dataclass
class TopK(_Stateless):
    k: int

    def apply(self, cand, rng):
        if self.k <= 0:
            return None
        k = min(self.k, len(cand.ids))
        if not cand.sorted:
            part = np.argpartition(-cand.logits, k - 1)[:k]
            order = part[np.argsort(-cand.logits[part], kind="stable")]
            cand.ids = cand.ids[order]
            cand.logits = cand.logits[order]
            cand.probs = None
            cand.sorted = True
        else:
            cand.truncate(k)
        cand.truncate(k)
        return None


@dataclass
class TopP(_Stateless):
    p: float
    min_keep: int = 1

    def apply(self, cand, rng):
        if self.p >= 1.0:
            return None
        cand.softmax()
        cum = np.cumsum(cand.probs)
        # keep up to and including the first index where cum >= p
        cut = int(np.searchsorted(cum, self.p)) + 1
        cand.truncate(max(cut, self.min_keep))
        return None


@dataclass
class MinP(_Stateless):
    p: float
    min_keep: int = 1

    def apply(self, cand, rng):
        if self.p <= 0.0:
            return None
        # unsorted path of llama_sampler_min_p: threshold on max logit
        mx = cand.logits.max()
        thr = mx + np.log(self.p)  # log(p * exp(max)) in logit space
        keep = cand.logits >= thr
        if keep.sum() >= self.min_keep:
            cand.ids = cand.ids[keep]
            cand.logits = cand.logits[keep]
            cand.probs = None
            cand.sorted = False
        return None


@dataclass
class Typical(_Stateless):
    p: float
    min_keep: int = 1

    def apply(self, cand, rng):
        if self.p >= 1.0:
            return None
        cand.softmax()
        entropy = -np.sum(cand.probs * np.log(cand.probs + 1e-12))
        shifted = np.abs(-np.log(cand.probs + 1e-12) - entropy)
        order = np.argsort(shifted, kind="stable")
        probs_sorted = cand.probs[order]
        cum = np.cumsum(probs_sorted)
        cut = max(int(np.searchsorted(cum, self.p)) + 1, self.min_keep)
        pick = order[:cut]
        cand.ids = cand.ids[pick]
        cand.logits = cand.logits[pick]
        cand.probs = None
        cand.sorted = False
        return None


@dataclass
class Temp(_Stateless):
    t: float

    def apply(self, cand, rng):
        if self.t <= 0:
            # llama.cpp temp<=0 → argmax-only (keep the single best)
            best = int(np.argmax(cand.logits))
            cand.ids = cand.ids[best : best + 1]
            cand.logits = cand.logits[best : best + 1]
            cand.probs = None
            return None
        cand.logits = cand.logits / self.t
        cand.probs = None
        return None


@dataclass
class TempExt(_Stateless):
    t: float
    delta: float = 0.0
    exponent: float = 1.0

    def apply(self, cand, rng):
        if self.delta <= 0 or len(cand.ids) <= 1:
            return Temp(self.t).apply(cand, rng)
        # dynamic temperature (entropy-scaled), llama_sampler_temp_ext
        cand.softmax()
        max_entropy = np.log(len(cand.probs))
        entropy = -np.sum(cand.probs * np.log(cand.probs + 1e-12))
        norm_e = entropy / max_entropy
        dyn_t = (self.t - self.delta) + 2 * self.delta * (norm_e**self.exponent)
        cand.logits = cand.logits / max(dyn_t, 1e-5)
        cand.probs = None
        return None


@dataclass
class XTC(_Stateless):
    p: float
    t: float
    min_keep: int = 1
    seed: int = 0

    def apply(self, cand, rng):
        if self.p <= 0 or self.t <= 0:
            return None
        if rng.random() > self.p:
            return None
        cand.softmax()
        above = np.nonzero(cand.probs >= self.t)[0]
        if len(above) >= 2:
            keep_from = int(above[-1])
            n = max(len(cand.ids) - keep_from, self.min_keep)
            cand.ids = cand.ids[-0:][keep_from:] if False else cand.ids[keep_from:]
            cand.logits = cand.logits[keep_from:]
            cand.probs = None
            cand.sorted = True
        return None


@dataclass
class TopNSigma(_Stateless):
    n: float

    def apply(self, cand, rng):
        if self.n <= 0:
            return None
        mx = cand.logits.max()
        std = cand.logits.std()
        keep = cand.logits >= mx - self.n * std
        cand.ids = cand.ids[keep]
        cand.logits = cand.logits[keep]
        cand.probs = None
        return None


@dataclass
class Penalties:
    """repeat/freq/presence penalties over the last penalty_last_n accepted
    tokens (llama_sampler_penalties)."""

    penalty_last_n: int = 64
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    prev: list[int] = field(default_factory=list)

    def accept(self, token: int) -> None:
        if self.penalty_last_n:
            self.prev.append(token)
            if len(self.prev) > self.penalty_last_n:
                self.prev.pop(0)

    def reset(self) -> None:
        self.prev.clear()

    def apply(self, cand, rng):
        if (
            self.penalty_last_n == 0
            or (self.penalty_repeat == 1 and self.penalty_freq == 0 and self.penalty_present == 0)
            or not self.prev
        ):
            return None
        counts: dict[int, int] = {}
        for t in self.prev:
            counts[t] = counts.get(t, 0) + 1
        id_pos = {int(t): i for i, t in enumerate(cand.ids)}
        for tok, cnt in counts.items():
            i = id_pos.get(tok)
            if i is None:
                continue
            logit = cand.logits[i]
            if logit <= 0:
                logit *= self.penalty_repeat
            else:
                logit /= self.penalty_repeat
            logit -= cnt * self.penalty_freq + (cnt > 0) * self.penalty_present
            cand.logits[i] = logit
        cand.probs = None
        cand.sorted = False
        return None


@dataclass
class LogitBias(_Stateless):
    bias: dict[int, float] = field(default_factory=dict)

    def apply(self, cand, rng):
        if not self.bias:
            return None
        for tok, b in self.bias.items():
            idx = np.nonzero(cand.ids == tok)[0]
            if len(idx):
                cand.logits[idx[0]] += b
        cand.probs = None
        return None


@dataclass
class MirostatV2:
    tau: float = 5.0
    eta: float = 0.1
    mu: float | None = None

    def reset(self) -> None:
        self.mu = None

    def accept(self, token: int) -> None:
        pass

    def apply(self, cand, rng):
        if self.mu is None:
            self.mu = 2 * self.tau
        cand.softmax()
        surprise = -np.log2(cand.probs + 1e-12)
        keep = surprise <= self.mu
        if not keep.any():
            keep[0] = True
        n = int(keep.sum())
        cand.truncate(max(n, 1))
        cand.softmax()
        idx = rng.choice(len(cand.probs), p=cand.probs)
        tok = int(cand.ids[idx])
        observed = -np.log2(cand.probs[idx] + 1e-12)
        self.mu -= self.eta * (observed - self.tau)
        return tok


@dataclass
class MirostatV1:
    """Mirostat v1 (llama_sampler_init_mirostat, src/llama-sampling.cpp:
    1229-1262): estimate the Zipf exponent s-hat from the top-m candidate
    probabilities, derive k for the target surprise mu, top-k truncate,
    sample, then nudge mu toward tau."""

    n_vocab: int | None = None  # None: infer from the candidate set
    tau: float = 5.0
    eta: float = 0.1
    m: int = 100
    mu: float | None = None

    def reset(self) -> None:
        self.mu = None

    def accept(self, token: int) -> None:
        pass

    def apply(self, cand, rng):
        if self.mu is None:
            self.mu = 2 * self.tau
        cand.softmax()
        p = cand.probs
        n = min(self.m - 1, len(p) - 1)
        i = np.arange(n, dtype=np.float64)
        t_i = np.log((i + 2) / (i + 1))
        b_i = np.log(p[:n] / np.maximum(p[1 : n + 1], 1e-30))
        s_hat = float((t_i * b_i).sum() / (t_i * t_i).sum())
        nv = float(self.n_vocab if self.n_vocab else len(p))
        eps = s_hat - 1
        k = ((eps * 2.0 ** self.mu) / (1 - nv ** -eps)) ** (1 / s_hat)
        if not np.isfinite(k):
            k = len(p)
        cand.truncate(max(int(k), 1))
        cand.softmax()
        idx = rng.choice(len(cand.probs), p=cand.probs)
        tok = int(cand.ids[idx])
        observed = -np.log2(cand.probs[idx] + 1e-12)
        self.mu -= self.eta * (observed - self.tau)
        return tok


@dataclass
class Dry:
    """DRY repetition penalty (llama_sampler_dry) — simplified core:
    penalize continuations of repeated suffixes."""

    multiplier: float = 0.0
    base: float = 1.75
    allowed_length: int = 2
    penalty_last_n: int = 512
    prev: list[int] = field(default_factory=list)

    def accept(self, token: int) -> None:
        self.prev.append(token)
        if len(self.prev) > self.penalty_last_n:
            self.prev.pop(0)

    def reset(self) -> None:
        self.prev.clear()

    def apply(self, cand, rng):
        if self.multiplier <= 0 or len(self.prev) < self.allowed_length + 1:
            return None
        hist = self.prev
        n = len(hist)
        # for each candidate token: longest suffix of hist that, followed by
        # that token, appears earlier in hist
        best: dict[int, int] = {}
        for i in range(n - 1):
            # match length of hist[..i] suffix vs global suffix
            length = 0
            while length < i + 1 and length < n and hist[i - length] == hist[n - 1 - length]:
                length += 1
            if length >= self.allowed_length and i + 1 < n:
                nxt = hist[i + 1]
                best[nxt] = max(best.get(nxt, 0), length)
        if not best:
            return None
        id_pos = {int(t): j for j, t in enumerate(cand.ids)}
        for tok, length in best.items():
            j = id_pos.get(tok)
            if j is not None:
                cand.logits[j] -= self.multiplier * (
                    self.base ** (length - self.allowed_length)
                )
        cand.probs = None
        cand.sorted = False
        return None


@dataclass
class Infill(_Stateless):
    """FIM infill sampler (llama_sampler_init_infill,
    src/llama-sampling.cpp:2491; apply at :2294-2472): stabilizes
    fill-in-the-middle termination by (1) forcing EOG when the combined
    EOG mass dominates (3·p_eog·n > p_txt), (2) merging tokens whose text
    pieces share a prefix (prob mass flows to the higher-p token), and
    (3) two keep-threshold passes (p ≥ 0.2, then p ≥ 1/(n_non_eog+1))
    that always retain EOG candidates. Falls back to the single EOT token
    when no non-EOG candidate survives.

    `tokenizer` must expose token_to_piece(tid, special=...) and a .vocab
    with is_eog/eot_id. Place after a truncating sampler (top-k) — the
    prefix-merge is pairwise, exactly like the reference's."""

    tokenizer: object

    def apply(self, cand, rng):
        vocab = self.tokenizer.vocab
        cand.softmax()
        ids = cand.ids
        p = cand.probs.astype(np.float64).copy()
        eog = np.fromiter((vocab.is_eog(int(t)) for t in ids), bool, len(ids))
        p_eog = float(p[eog].sum())
        p_txt = float(p[~eog].sum())

        def commit(keep_ids, keep_p):
            s = keep_p.sum()
            keep_p = keep_p / s if s > 0 else np.full_like(keep_p, 1.0 / len(keep_p))
            cand.ids = np.asarray(keep_ids, np.int32)
            cand.probs = keep_p.astype(np.float32)
            # downstream Dist re-softmaxes from logits: log(p) reproduces
            # the merged distribution exactly
            with np.errstate(divide="ignore"):
                cand.logits = np.log(keep_p).astype(np.float32)
            cand.sorted = True
            return None

        if 3.0 * p_eog * len(ids) > p_txt:
            return commit(ids[eog], p[eog])

        # combine tokens with a common prefix (reference pairwise merge:
        # piece(i0) a prefix of piece(i1) → mass to the higher-p one)
        pieces = [self.tokenizer.token_to_piece(int(t), special=False)
                  for t in ids]
        alive = np.ones(len(ids), bool)
        for i0 in range(len(ids)):
            for i1 in range(len(ids)):
                if not alive[i0]:
                    break
                if i0 == i1 or not alive[i1]:
                    continue
                l0 = len(pieces[i0])
                if l0 > 0 and l0 <= len(pieces[i1]) \
                        and pieces[i1][:l0] == pieces[i0]:
                    dst, src = (i0, i1) if p[i0] >= p[i1] else (i1, i0)
                    p[dst] += p[src]
                    p[src] = 0.0
                    alive[src] = False

        # pass 1: p ≥ 0.2 or EOG
        keep = alive & ((p >= 0.2) | eog)
        n_non_eog = int((keep & ~eog).sum())
        if n_non_eog == 0:
            eot = vocab.eot_id if vocab.eot_id >= 0 else vocab.eos_id
            cand.ids = np.asarray([eot], np.int32)
            cand.logits = np.asarray([1.0], np.float32)
            cand.probs = np.asarray([1.0], np.float32)
            cand.sorted = True
            return None
        ids1, p1, eog1 = ids[keep], p[keep], eog[keep]
        p1 = p1 / p1.sum()
        # pass 2: p ≥ 1/(n_non_eog+1) or EOG
        keep2 = (p1 >= 1.0 / (n_non_eog + 1)) | eog1
        return commit(ids1[keep2], p1[keep2])


@dataclass
class SamplerChain:
    samplers: list = field(default_factory=list)
    rng: np.random.Generator = field(default_factory=lambda: np.random.default_rng(0))
    n_sampled: int = 0
    grammar: object = None  # GrammarSampler — applied two-phase (see sample)

    @property
    def is_greedy(self) -> bool:
        """True when device-side argmax is semantically identical: a pure
        greedy chain with no logit-modifying or stateful samplers."""
        active = [s for s in self.samplers
                  if not (isinstance(s, Penalties) and s.penalty_repeat == 1.0
                          and s.penalty_freq == 0.0 and s.penalty_present == 0.0)]
        return (self.grammar is None and len(active) == 1
                and isinstance(active[0], Greedy))

    @property
    def device_spec(self) -> dict | None:
        """Parameters for on-device sampling (ops/device_sampling) when the
        chain is the stateless default pipeline (top-k → top-p → min-p →
        temp → dist) with no grammar, penalties, or exotic samplers; None
        otherwise (host path)."""
        from ..ops.device_sampling import MAX_DEVICE_TOP_K

        if self.grammar is not None:
            return None
        if self.is_greedy:
            # a pure greedy chain is top_k=1 on device: the single surviving
            # candidate is argmax with the same first-max tie-break
            return {"top_k": 1, "top_p": 1.0, "min_p": 0.0, "temp": 1.0}
        spec = {"top_k": 0, "top_p": 1.0, "min_p": 0.0, "temp": 1.0}
        seen_dist = False
        for s in self.samplers:
            if isinstance(s, Penalties) and (
                s.penalty_repeat == 1.0 and s.penalty_freq == 0.0
                and s.penalty_present == 0.0
            ):
                continue
            if isinstance(s, Typical) and s.p >= 1.0:
                continue
            if isinstance(s, TopK):
                spec["top_k"] = s.k
            elif isinstance(s, TopP):
                spec["top_p"] = float(s.p)
            elif isinstance(s, MinP):
                spec["min_p"] = float(s.p)
            elif isinstance(s, Temp):
                if s.t <= 0:
                    return None  # argmax semantics — the greedy fast path
                spec["temp"] = float(s.t)
            elif isinstance(s, Dist):
                seen_dist = True
            else:
                return None
        if not seen_dist or not (0 < spec["top_k"] <= MAX_DEVICE_TOP_K):
            return None
        return spec

    def _run(self, cand) -> int:
        token: int | None = None
        for s in self.samplers:
            token = s.apply(cand, self.rng)
            if token is not None:
                break
        if token is None:
            # no terminal sampler fired: greedy over what's left
            token = int(cand.ids[int(np.argmax(cand.logits))])
        return token

    def sample(self, logits: np.ndarray) -> int:
        cand = Candidates.from_logits(logits)
        token = self._run(cand)
        if self.grammar is not None and not self.grammar.token_allowed(token):
            # two-phase grammar (common_sampler_sample, common/sampling.cpp:
            # grammar_first=false): only on violation re-filter the full
            # vocab and resample — keeps the PDA off the hot path
            cand = Candidates.from_logits(logits)
            self.grammar.apply(cand, self.rng)
            token = self._run(cand)
        self.accept(token)
        self.n_sampled += 1
        return token

    def peek(self, logits: np.ndarray) -> int:
        """Sample WITHOUT accepting — the reference's common_sampler_sample
        with no common_sampler_accept (lookahead window guesses,
        lookahead.cpp:362 samples speculative tokens that never enter the
        penalty/grammar state)."""
        return self._run(Candidates.from_logits(logits))

    def accept(self, token: int) -> None:
        for s in self.samplers:
            s.accept(token)
        if self.grammar is not None:
            self.grammar.accept(token)

    def reset(self) -> None:
        for s in self.samplers:
            s.reset()
        if self.grammar is not None:
            self.grammar.reset()
        self.n_sampled = 0


def make_chain(
    *,
    seed: int = 0,
    temp: float = 0.8,
    dynatemp_range: float = 0.0,
    dynatemp_exponent: float = 1.0,
    top_k: int = 40,
    top_p: float = 0.95,
    min_p: float = 0.05,
    typical_p: float = 1.0,
    xtc_probability: float = 0.0,
    xtc_threshold: float = 0.1,
    top_n_sigma: float = -1.0,
    penalty_last_n: int = 64,
    penalty_repeat: float = 1.0,
    penalty_freq: float = 0.0,
    penalty_present: float = 0.0,
    dry_multiplier: float = 0.0,
    mirostat: int = 0,
    mirostat_tau: float = 5.0,
    mirostat_eta: float = 0.1,
    logit_bias: dict[int, float] | None = None,
    grammar=None,
    infill_tokenizer=None,
) -> SamplerChain:
    """Default chain ordering — mirrors common_sampler_init
    (common/sampling.cpp): logit-bias → penalties → dry → top-n-sigma/
    top-k → typical → top-p → min-p → xtc → temp → dist.
    `infill_tokenizer` inserts the FIM infill sampler after top-k
    (COMMON_SAMPLER_TYPE_INFILL, common/sampling.cpp:269)."""
    chain: list = []
    if logit_bias:
        chain.append(LogitBias(logit_bias))
    chain.append(
        Penalties(
            penalty_last_n=penalty_last_n,
            penalty_repeat=penalty_repeat,
            penalty_freq=penalty_freq,
            penalty_present=penalty_present,
        )
    )
    if dry_multiplier > 0:
        chain.append(Dry(multiplier=dry_multiplier))
    if temp <= 0:
        if infill_tokenizer is not None:
            chain.append(TopK(top_k))
            chain.append(Infill(infill_tokenizer))
        chain.append(Greedy())
        return SamplerChain(chain, np.random.default_rng(seed), grammar=grammar)
    if mirostat == 2:
        chain.append(Temp(temp))
        chain.append(MirostatV2(mirostat_tau, mirostat_eta))
        return SamplerChain(chain, np.random.default_rng(seed), grammar=grammar)
    if mirostat == 1:
        chain.append(Temp(temp))
        chain.append(MirostatV1(tau=mirostat_tau, eta=mirostat_eta))
        return SamplerChain(chain, np.random.default_rng(seed), grammar=grammar)
    if top_n_sigma >= 0:
        chain.append(TopK(top_k))
        if infill_tokenizer is not None:
            chain.append(Infill(infill_tokenizer))
        chain.append(TopNSigma(top_n_sigma))
        chain.append(Temp(temp))
    else:
        chain.append(TopK(top_k))
        if infill_tokenizer is not None:
            chain.append(Infill(infill_tokenizer))
        if typical_p < 1.0:
            chain.append(Typical(typical_p))
        chain.append(TopP(top_p))
        chain.append(MinP(min_p))
        if xtc_probability > 0:
            chain.append(XTC(xtc_probability, xtc_threshold))
        if dynatemp_range > 0:
            chain.append(TempExt(temp, dynatemp_range, dynatemp_exponent))
        else:
            chain.append(Temp(temp))
    chain.append(Dist())
    return SamplerChain(chain, np.random.default_rng(seed), grammar=grammar)
