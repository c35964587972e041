"""T5 encoder-decoder vs HF T5ForConditionalGeneration (tiny random)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llama_cpp_dsp_tpu.models.t5 import T5Config, t5_decode, t5_encode


def _t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


@pytest.fixture(scope="module")
def t5_pair():
    hf_cfg = transformers.T5Config(
        vocab_size=96, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dropout_rate=0.0,
        feed_forward_proj="relu", tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    cfg = T5Config(n_layers=2, n_embd=64, n_heads=4, head_dim=16, n_ff=128,
                   n_vocab=96, rel_buckets=8, rel_max_distance=32,
                   act="relu", tie_embeddings=True)

    def block_params(stack, is_dec):
        layers = []
        for bl in stack.block:
            sa = bl.layer[0]
            layer = {
                "attn_norm": _t2n(sa.layer_norm.weight),
                "attn_q": _t2n(sa.SelfAttention.q.weight),
                "attn_k": _t2n(sa.SelfAttention.k.weight),
                "attn_v": _t2n(sa.SelfAttention.v.weight),
                "attn_o": _t2n(sa.SelfAttention.o.weight),
            }
            if is_dec:
                ca = bl.layer[1]
                layer.update({
                    "cross_attn_norm": _t2n(ca.layer_norm.weight),
                    "cross_attn_q": _t2n(ca.EncDecAttention.q.weight),
                    "cross_attn_k": _t2n(ca.EncDecAttention.k.weight),
                    "cross_attn_v": _t2n(ca.EncDecAttention.v.weight),
                    "cross_attn_o": _t2n(ca.EncDecAttention.o.weight),
                })
            ff = bl.layer[-1]
            layer.update({
                "ffn_norm": _t2n(ff.layer_norm.weight),
                "ffn_up": _t2n(ff.DenseReluDense.wi.weight),
                "ffn_down": _t2n(ff.DenseReluDense.wo.weight),
            })
            layers.append(layer)
        return layers

    params = {
        "token_embd": _t2n(hf.shared.weight),
        "enc_layers": block_params(hf.encoder, False),
        "enc_output_norm": _t2n(hf.encoder.final_layer_norm.weight),
        "enc_rel_b": _t2n(
            hf.encoder.block[0].layer[0].SelfAttention
            .relative_attention_bias.weight),
        "dec_layers": block_params(hf.decoder, True),
        "dec_output_norm": _t2n(hf.decoder.final_layer_norm.weight),
        "dec_rel_b": _t2n(
            hf.decoder.block[0].layer[0].SelfAttention
            .relative_attention_bias.weight),
    }
    return cfg, params, hf


def test_t5_encoder_parity(t5_pair):
    cfg, params, hf = t5_pair
    toks = np.array([[4, 17, 9, 33, 2]], np.int32)
    ours = np.asarray(t5_encode(params, cfg, jnp.asarray(toks)))
    with torch.no_grad():
        want = _t2n(hf.encoder(torch.tensor(toks, dtype=torch.long))
                    .last_hidden_state)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_t5_full_parity(t5_pair):
    cfg, params, hf = t5_pair
    src = np.array([[4, 17, 9, 33, 2]], np.int32)
    tgt = np.array([[0, 8, 25]], np.int32)
    enc = t5_encode(params, cfg, jnp.asarray(src))
    ours = np.asarray(t5_decode(params, cfg, jnp.asarray(tgt), enc))
    with torch.no_grad():
        want = _t2n(hf(input_ids=torch.tensor(src, dtype=torch.long),
                       decoder_input_ids=torch.tensor(tgt, dtype=torch.long))
                    .logits)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_t5_gguf_roundtrip(tmp_path, t5_pair):
    """Write the T5 params as a GGUF (reference enc./dec. names), reload
    via load_t5, logits identical."""
    import numpy as np
    from llama_cpp_dsp_tpu.gguf.writer import GGUFWriter
    from llama_cpp_dsp_tpu.runtime.loader import load_t5

    cfg, params, _ = t5_pair
    path = str(tmp_path / "t5.gguf")
    w = GGUFWriter(path, "t5")
    w.add_uint32("t5.block_count", cfg.n_layers)
    w.add_uint32("t5.embedding_length", cfg.n_embd)
    w.add_uint32("t5.attention.head_count", cfg.n_heads)
    w.add_uint32("t5.attention.key_length", cfg.head_dim)
    w.add_uint32("t5.feed_forward_length", cfg.n_ff)
    w.add_uint32("t5.vocab_size", cfg.n_vocab)
    w.add_uint32("t5.attention.relative_buckets_count", cfg.rel_buckets)
    w.add_float32("t5.attention.layer_norm_rms_epsilon", cfg.eps)
    w.add_tensor("token_embd.weight", params["token_embd"])
    w.add_tensor("enc.output_norm.weight", params["enc_output_norm"])
    w.add_tensor("dec.output_norm.weight", params["dec_output_norm"])
    w.add_tensor("enc.blk.0.attn_rel_b.weight", params["enc_rel_b"])
    w.add_tensor("dec.blk.0.attn_rel_b.weight", params["dec_rel_b"])
    inv = {"attn_norm": "attn_norm.weight", "attn_q": "attn_q.weight",
           "attn_k": "attn_k.weight", "attn_v": "attn_v.weight",
           "attn_o": "attn_o.weight", "cross_attn_norm": "cross_attn_norm.weight",
           "cross_attn_q": "cross_attn_q.weight", "cross_attn_k": "cross_attn_k.weight",
           "cross_attn_v": "cross_attn_v.weight", "cross_attn_o": "cross_attn_o.weight",
           "ffn_norm": "ffn_norm.weight", "ffn_up": "ffn_up.weight",
           "ffn_down": "ffn_down.weight"}
    for side in ("enc", "dec"):
        for i, layer in enumerate(params[f"{side}_layers"]):
            for k, arr in layer.items():
                w.add_tensor(f"{side}.blk.{i}.{inv[k]}", np.ascontiguousarray(arr))
    w.write()

    cfg2, params2, _, _, _ = load_t5(path, with_tokenizer=False)
    assert cfg2.n_layers == cfg.n_layers
    src = np.array([[4, 17, 9]], np.int32)
    tgt = np.array([[0, 8]], np.int32)
    e1 = t5_encode(params, cfg, jnp.asarray(src))
    e2 = t5_encode(params2, cfg2, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)
    d1 = t5_decode(params, cfg, jnp.asarray(tgt), e1)
    d2 = t5_decode(params2, cfg2, jnp.asarray(tgt), e2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
