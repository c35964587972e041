"""BERT encoder vs HF BertModel: hidden-state + pooling parity."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llama_cpp_dsp_tpu.models.bert import bert_forward
from llama_cpp_dsp_tpu.models.llama import LlamaConfig


def _t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


@pytest.fixture(scope="module")
def bert_pair():
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", layer_norm_eps=1e-12,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg).eval()

    cfg = LlamaConfig(arch="bert", n_layers=2, n_embd=64, n_heads=4,
                      n_kv_heads=4, head_dim=16, n_ff=128, n_vocab=128,
                      n_ctx_train=64, rms_eps=1e-12, norm_type="ln",
                      pos_embd_type="learned")
    layers = []
    for hl in hf.encoder.layer:
        layers.append({
            "attn_q": _t2n(hl.attention.self.query.weight),
            "attn_q_bias": _t2n(hl.attention.self.query.bias),
            "attn_k": _t2n(hl.attention.self.key.weight),
            "attn_k_bias": _t2n(hl.attention.self.key.bias),
            "attn_v": _t2n(hl.attention.self.value.weight),
            "attn_v_bias": _t2n(hl.attention.self.value.bias),
            "attn_output": _t2n(hl.attention.output.dense.weight),
            "attn_output_bias": _t2n(hl.attention.output.dense.bias),
            "attn_output_norm": _t2n(hl.attention.output.LayerNorm.weight),
            "attn_output_norm_bias": _t2n(hl.attention.output.LayerNorm.bias),
            "ffn_up": _t2n(hl.intermediate.dense.weight),
            "ffn_up_bias": _t2n(hl.intermediate.dense.bias),
            "ffn_down": _t2n(hl.output.dense.weight),
            "ffn_down_bias": _t2n(hl.output.dense.bias),
            "layer_output_norm": _t2n(hl.output.LayerNorm.weight),
            "layer_output_norm_bias": _t2n(hl.output.LayerNorm.bias),
        })
    params = {
        "token_embd": _t2n(hf.embeddings.word_embeddings.weight),
        "pos_embd": _t2n(hf.embeddings.position_embeddings.weight),
        "token_types": _t2n(hf.embeddings.token_type_embeddings.weight),
        "token_embd_norm": _t2n(hf.embeddings.LayerNorm.weight),
        "token_embd_norm_bias": _t2n(hf.embeddings.LayerNorm.bias),
        "layers": layers,
    }
    return cfg, params, hf


def test_bert_hidden_parity(bert_pair):
    cfg, params, hf = bert_pair
    toks = np.array([[2, 45, 99, 7, 3]], np.int32)
    ours = np.asarray(bert_forward(params, cfg, jnp.asarray(toks), pooling="none"))
    with torch.no_grad():
        want = _t2n(hf(torch.tensor(toks, dtype=torch.long)).last_hidden_state)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_bert_padding_mask_and_pooling(bert_pair):
    cfg, params, hf = bert_pair
    toks = np.array([[2, 45, 99, 0, 0], [2, 7, 0, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 0, 0, 0]], bool)
    ours = np.asarray(bert_forward(params, cfg, jnp.asarray(toks),
                                   jnp.asarray(mask), pooling="mean"))
    with torch.no_grad():
        out = hf(torch.tensor(toks, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long))
        h = _t2n(out.last_hidden_state)
    m = mask[:, :, None]
    want = (h * m).sum(1) / m.sum(1)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_bert_rank_head_parity(bert_pair):
    """pooling="rank" == HF BertForSequenceClassification (pooler dense+tanh
    -> classifier) — the reference's LLAMA_POOLING_TYPE_RANK cls/cls.output."""
    cfg, params, hf = bert_pair
    torch.manual_seed(1)
    clf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", layer_norm_eps=1e-12, num_labels=1,
    )
    clf = transformers.BertForSequenceClassification(clf_cfg).eval()
    clf.bert.load_state_dict(hf.state_dict(), strict=False)
    params = dict(params)
    params["cls"] = _t2n(clf.bert.pooler.dense.weight)
    params["cls_bias"] = _t2n(clf.bert.pooler.dense.bias)
    params["cls_output"] = _t2n(clf.classifier.weight)
    params["cls_output_bias"] = _t2n(clf.classifier.bias)

    toks = np.array([[2, 45, 99, 7, 3]], np.int32)
    ours = np.asarray(bert_forward(params, cfg, jnp.asarray(toks), pooling="rank"))
    with torch.no_grad():
        want = _t2n(clf(torch.tensor(toks, dtype=torch.long)).logits)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_bert_engine_rank(tmp_path):
    """GGUF -> Engine end-to-end for an encoder model: pooled embeddings and
    cross-encoder rank scores through the loaded cls head."""
    import sys

    sys.path.insert(0, "tests")
    from model_builder import build_tiny_bert

    from llama_cpp_dsp_tpu.runtime.engine import Engine
    from llama_cpp_dsp_tpu.runtime.loader import load_model

    path = str(tmp_path / "bert.gguf")
    build_tiny_bert(path)
    model = load_model(path)
    assert model.cfg.pooling == "rank"
    eng = Engine(model, n_slots=1, n_ctx_per_slot=64, prefill_buckets=(16,))
    assert eng.has_rank_head
    vec = eng.embed([1, 5, 9, 2], pooling="mean")
    assert vec.shape == (64,)
    s1 = eng.rank([1, 5, 9, 2, 7, 2])
    s2 = eng.rank([1, 5, 9, 2, 8, 2])
    assert np.isfinite(s1) and np.isfinite(s2) and s1 != s2
    # scores match a direct bert_forward with the same ids
    direct = np.asarray(bert_forward(
        model.params, model.cfg,
        jnp.asarray(np.array([[1, 5, 9, 2, 7, 2]], np.int32)),
        pooling="rank", compute_dtype=jnp.bfloat16))
    np.testing.assert_allclose(s1, float(direct[0, 0]), rtol=2e-2, atol=2e-2)
