"""FIM infill sampler semantics (llama_sampler_init_infill,
reference src/llama-sampling.cpp:2491, apply at :2294-2472):
EOG-mass forcing, common-prefix token merging, the two keep-threshold
passes, and the single-EOT fallback."""

import numpy as np

from llama_cpp_dsp_tpu.runtime.sampling import Candidates, Infill


class _Vocab:
    def __init__(self, eog_ids, eot_id=9, eos_id=9):
        self._eog = set(eog_ids)
        self.eot_id = eot_id
        self.eos_id = eos_id

    def is_eog(self, tid):
        return tid in self._eog


class _Tok:
    """Tokenizer stub: pieces indexed by token id."""

    def __init__(self, pieces, eog_ids, eot_id=9):
        self._pieces = pieces
        self.vocab = _Vocab(eog_ids, eot_id=eot_id)

    def token_to_piece(self, tid, special=False):
        return self._pieces.get(tid, "")


def _cand(ids, probs):
    probs = np.asarray(probs, np.float64)
    logits = np.log(probs / probs.sum()).astype(np.float32)
    return Candidates(np.asarray(ids, np.int32), logits)


def _run(tok, ids, probs):
    cand = _cand(ids, probs)
    Infill(tok).apply(cand, np.random.default_rng(0))
    cand.softmax()
    return {int(t): float(p) for t, p in zip(cand.ids, cand.probs)}


def test_eog_forced_when_mass_dominates():
    # 4 candidates, p_eog=0.3, p_txt=0.7: 3*0.3*4 = 3.6 > 0.7 → EOG only
    tok = _Tok({0: "a", 1: "b", 2: "c", 9: ""}, eog_ids={9})
    out = _run(tok, [0, 1, 2, 9], [0.3, 0.25, 0.15, 0.3])
    assert set(out) == {9}
    assert abs(out[9] - 1.0) < 1e-6


def test_prefix_merge_moves_mass_to_higher_p():
    # "for" (0.5) and "fortune" (0.3): "for" is a prefix of "fortune" →
    # mass merges onto "for" (the higher-p side) giving 0.8; "x" (0.2)
    # survives pass 1 (p ≥ 0.2) but pass 2's 1/(n_non_eog+1)=1/3 cut
    # drops it → "for" alone
    tok = _Tok({0: "for", 1: "fortune", 2: "x", 9: ""}, eog_ids={9})
    out = _run(tok, [0, 1, 2], [0.5, 0.3, 0.2])
    assert set(out) == {0}
    assert abs(out[0] - 1.0) < 1e-6


def test_prefix_merge_prefers_larger_prob_dst():
    # prefix token has LOWER p: mass flows to the longer, higher-p token
    tok = _Tok({0: "in", 1: "inside", 9: ""}, eog_ids={9})
    out = _run(tok, [0, 1], [0.3, 0.7])
    assert 0 not in out and abs(out[1] - 1.0) < 1e-6


def test_threshold_passes_drop_low_p_keep_eog():
    # p < 0.2 non-EOG tokens are dropped in pass 1; EOG survives both
    # passes regardless of its probability
    tok = _Tok({0: "aa", 1: "bb", 2: "cc", 3: "dd", 9: ""}, eog_ids={9})
    out = _run(tok, [0, 1, 2, 3, 9], [0.5, 0.3, 0.12, 0.03, 0.05])
    # pass 1 keeps 0.5, 0.3 (+EOG 0.05), renorm /0.85; pass 2 thold=1/3
    # keeps both survivors (0.588, 0.353) and the EOG
    assert set(out) == {0, 1, 9}
    assert abs(out[0] - 0.5 / 0.85) < 1e-6
    assert abs(out[9] - 0.05 / 0.85) < 1e-6


def test_eot_fallback_when_no_text_survives():
    # all non-EOG candidates are < 0.2 after merge and fail pass 1 →
    # single forced EOT token
    tok = _Tok({i: f"t{i}" for i in range(8)} | {9: ""}, eog_ids={9},
               eot_id=9)
    ids = list(range(8))
    probs = [0.125] * 8  # every piece distinct, all < 0.2, no EOG present
    out = _run(tok, ids, probs)
    assert set(out) == {9}


def test_second_pass_threshold():
    # pass 2 keeps p >= 1/(n_non_eog+1): with 3 survivors the cut is 0.25
    tok = _Tok({0: "aa", 1: "bb", 2: "cc", 9: ""}, eog_ids={9})
    out = _run(tok, [0, 1, 2], [0.55, 0.23, 0.22])
    # pass 1 keeps all three (>= 0.2); n_non_eog=3 → cut 1/4;
    # renormalized values stay the same (already sum to 1) so 0.23 < 0.25
    # drops... wait 0.23 < 0.25 and 0.22 < 0.25 → only 0.55 stays
    assert set(out) == {0}


def test_chain_integration():
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain

    tok = _Tok({0: "for", 1: "fortune", 2: "x", 9: ""}, eog_ids={9})
    chain = make_chain(temp=0.0, infill_tokenizer=tok)
    logits = np.full(10, -10.0, np.float32)
    logits[[0, 1, 2]] = [2.0, 1.5, 1.0]
    assert chain.sample(logits) == 0
