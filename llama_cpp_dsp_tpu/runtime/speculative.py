"""Speculative decoding — draft/verify across two contexts.

Capability mirror of reference common/speculative.cpp
(common_speculative_gen_draft :24-28 + the verify loop in
examples/server/server.cpp:1249,3290): the draft model proposes up to
n_draft tokens (greedy, stopping when its confidence drops below p_min);
the target evaluates draft+1 positions in one batch and accepts the longest
prefix that matches its own sampling decisions. Rejected tail rolls back
both KV caches (positions beyond n_past are overwritten before they become
attendable, so rollback is just the counter).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .context import LlamaContext
from .sampling import SamplerChain


@dataclass
class SpecParams:
    n_draft: int = 16  # max tokens drafted per round
    n_min: int = 0  # don't bother drafting fewer than this
    p_min: float = 0.75  # stop drafting when draft confidence drops below


@dataclass
class SpecStats:
    n_draft_proposed: int = 0
    n_draft_accepted: int = 0
    n_rounds: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.n_draft_accepted / max(self.n_draft_proposed, 1)


def _softmax(v: np.ndarray) -> np.ndarray:
    m = v.max()
    e = np.exp(v - m)
    return e / e.sum()


class SpeculativeDecoder:
    def __init__(self, target: LlamaContext, draft: LlamaContext,
                 params: SpecParams | None = None):
        self.target = target
        self.draft = draft
        self.params = params or SpecParams()
        self.stats = SpecStats()

    def _gen_draft(self, last_token: int) -> list[int]:
        """Greedy draft continuation from the draft model's current state."""
        p = self.params
        drafted: list[int] = []
        logits = self.draft.eval_tokens([last_token])
        for _ in range(p.n_draft):
            probs = _softmax(logits)
            tok = int(np.argmax(probs))
            if probs[tok] < p.p_min and len(drafted) >= p.n_min:
                break
            drafted.append(tok)
            if self.draft.vocab is not None and self.draft.vocab.is_eog(tok):
                break
            if self.draft.n_past + 1 >= self.draft.n_ctx:
                break
            logits = self.draft.eval_tokens([tok])
        return drafted

    def generate(
        self,
        prompt_tokens: list[int],
        *,
        max_new_tokens: int = 128,
        sampler: SamplerChain | None = None,
        stop_on_eog: bool = True,
    ):
        """Yields accepted tokens. Both contexts must be reset by the caller."""
        from .sampling import Greedy, SamplerChain as SC

        sampler = sampler or SC([Greedy()])
        tgt, drf = self.target, self.draft

        logits = tgt.eval_tokens(list(prompt_tokens))
        # the draft holds the full prompt; each round starts by feeding it the
        # newest sampled token (common_speculative_gen_draft's prompt + id_last)
        drf.eval_tokens(list(prompt_tokens))
        last = sampler.sample(logits)
        yield last
        produced = 1
        if stop_on_eog and tgt.vocab is not None and tgt.vocab.is_eog(last):
            return

        while produced < max_new_tokens:
            draft_rollback = drf.n_past
            drafted = self._gen_draft(last)
            self.stats.n_rounds += 1
            self.stats.n_draft_proposed += len(drafted)

            batch = [last] + drafted
            if tgt.n_past + len(batch) > tgt.n_ctx:
                batch = batch[: tgt.n_ctx - tgt.n_past]
                drafted = batch[1:]
            tgt_rollback = tgt.n_past
            all_logits = self.target.eval_tokens_all(batch)  # [len(batch), V]

            accepted = 0
            next_token = None
            for i in range(len(batch)):
                tok = sampler.sample(all_logits[i])
                if i < len(drafted) and tok == drafted[i]:
                    accepted += 1
                    yield tok
                    produced += 1
                    if produced >= max_new_tokens or (
                        stop_on_eog and tgt.vocab is not None and tgt.vocab.is_eog(tok)
                    ):
                        next_token = None
                        break
                else:
                    next_token = tok
                    break
            self.stats.n_draft_accepted += accepted

            if next_token is None:
                return
            # roll back both caches past the rejected tail
            tgt.rollback_to(tgt_rollback + 1 + accepted)
            drf.rollback_to(draft_rollback + 1 + accepted)
            yield next_token
            produced += 1
            last = next_token
            if stop_on_eog and tgt.vocab is not None and tgt.vocab.is_eog(last):
                return
