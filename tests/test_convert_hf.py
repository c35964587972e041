"""HF→GGUF converter E2E: tiny HF Llama (+ byte-level BPE tokenizer.json)
→ convert → load with our loader → logits match HF; tokenizer round-trips.

Mirror of the reference CI pipeline (ci/run.sh: download → convert →
quantize → run) at test scale.
"""

import json

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.runtime.kv_cache import causal_mask
from llama_cpp_dsp_tpu.tools.convert_hf import convert


def _byte_level_tokenizer(path, n_extra_merges=3):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    # base byte-level alphabet (the 256 gpt2 byte-unicode chars)
    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    he = "he"
    merges = [("h", "e"), ("l", "l"), ("Ġ", "w")][:n_extra_merges]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<s>"] = len(vocab)
    vocab["</s>"] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.save(str(path))
    return len(vocab)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_model")
    n_vocab = _byte_level_tokenizer(d / "tokenizer.json")
    (d / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>", "add_bos_token": False,
        "chat_template": "{% for m in messages %}{{ m['content'] }}{% endfor %}",
    }))
    hf_cfg = transformers.LlamaConfig(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)

    out = str(d / "model-f32.gguf")
    convert(str(d), out, "f32")
    return d, out, hf_model


def test_convert_logit_parity(converted):
    d, gguf_path, hf_model = converted
    model = load_model(gguf_path)
    assert model.cfg.arch == "llama"
    toks = np.array([[3, 45, 99, 7, 150]], np.int32)
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    ours, _ = forward(model.params, model.cfg, jnp.asarray(toks), jnp.asarray(pos),
                      mask=np.tril(np.ones((1, n, n), bool)),
                      compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf_model(torch.tensor(toks, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], theirs[0].numpy(),
                               rtol=2e-3, atol=2e-3)


def test_convert_tokenizer_parity(converted):
    d, gguf_path, _ = converted
    from tokenizers import Tokenizer as HFTok

    hf_tok = HFTok.from_file(str(d / "tokenizer.json"))
    model = load_model(gguf_path)
    assert model.vocab.chat_template
    for text in ("hello world", "hell", "a b c", "héllo"):
        ours = model.tokenizer.encode(text, add_special=False)
        theirs = hf_tok.encode(text).ids
        assert ours == theirs, (text, ours, theirs)
        assert model.tokenizer.decode(ours) == text


def test_convert_quantized_roundtrip(converted):
    d, _, hf_model = converted
    out = str(d / "model-q8.gguf")
    convert(str(d), out, "q8_0")
    model = load_model(out)
    toks = np.array([[5, 9, 31]], np.int32)
    pos = np.arange(3, dtype=np.int32).reshape(1, 3)
    ours, _ = forward(model.params, model.cfg, jnp.asarray(toks), jnp.asarray(pos),
                      mask=np.tril(np.ones((1, 3, 3), bool)),
                      compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf_model(torch.tensor(toks, dtype=torch.long)).logits.numpy()
    # q8_0 quantization noise bound
    denom = np.abs(theirs).max()
    assert np.abs(np.asarray(ours)[0] - theirs[0]).max() / denom < 0.05


def _tok_dir(tmp_path_factory, name):
    d = tmp_path_factory.mktemp(name)
    n_vocab = _byte_level_tokenizer(d / "tokenizer.json")
    (d / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>", "add_bos_token": False,
    }))
    return d, n_vocab


def test_convert_chameleon_parity(tmp_path_factory):
    """Chameleon conversion: q/k permute + per-head qk-LN weight reorder
    must preserve logits end to end."""
    d, n_vocab = _tok_dir(tmp_path_factory, "hf_chameleon")
    hf_cfg = transformers.ChameleonConfig(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, swin_norm=False, vocabulary_map={"a": 1},
    )
    torch.manual_seed(1)
    hf_model = transformers.ChameleonForConditionalGeneration(hf_cfg).eval()
    # the HF-side per-head norm rows are tied in real checkpoints; make them
    # identical so the converter's broadcast-row assumption holds
    with torch.no_grad():
        for lay in hf_model.model.layers:
            for nm in (lay.self_attn.q_norm, lay.self_attn.k_norm):
                nm.weight.copy_(nm.weight[0].expand_as(nm.weight))
                nm.bias.copy_(nm.bias[0].expand_as(nm.bias))
    hf_model.save_pretrained(str(d), safe_serialization=True)

    out = str(d / "model-f32.gguf")
    convert(str(d), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == "chameleon"
    assert model.cfg.qk_norm and model.cfg.qk_norm_ln

    import dataclasses
    cfg = dataclasses.replace(model.cfg, suppress_tokens=())  # tiny vocab
    toks = np.array([[3, 45, 99, 7, 150]], np.int32)
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    ours, _ = forward(model.params, cfg, jnp.asarray(toks), jnp.asarray(pos),
                      mask=np.tril(np.ones((1, n, n), bool)),
                      compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf_model(torch.tensor(toks, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], theirs[0].numpy(),
                               rtol=2e-3, atol=2e-3)


def test_convert_qwen2vl_parity(tmp_path_factory):
    """Qwen2-VL conversion: vision tower skipped, language_model prefix
    stripped, M-RoPE sections written; text logits must match HF."""
    d, n_vocab = _tok_dir(tmp_path_factory, "hf_qwen2vl")
    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
    )
    torch.manual_seed(2)
    hf_model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)

    out = str(d / "model-f32.gguf")
    convert(str(d), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == "qwen2vl"
    assert model.cfg.mrope_sections == (2, 3, 3, 0)

    toks = np.array([[3, 45, 99, 7, 150, 41]], np.int32)
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    ours, _ = forward(model.params, model.cfg, jnp.asarray(toks), jnp.asarray(pos),
                      mask=np.tril(np.ones((1, n, n), bool)),
                      compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf_model(input_ids=torch.tensor(toks, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], theirs[0].numpy(),
                               rtol=2e-3, atol=2e-3)


def test_convert_gptj_parity(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_gptj")
    n_vocab = _byte_level_tokenizer(d / "tokenizer.json")
    (d / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>"}))
    hf_cfg = transformers.GPTJConfig(
        vocab_size=n_vocab, n_embd=64, n_inner=128, n_layer=2, n_head=4,
        rotary_dim=8, n_positions=64, layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(1)
    hf_model = transformers.GPTJForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == "gptj"
    toks = np.array([[3, 45, 99, 7]], np.int32)
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    ours, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                      jnp.asarray(pos),
                      mask=np.tril(np.ones((1, n, n), bool)),
                      compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf_model(torch.tensor(toks, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], theirs[0].numpy(),
                               rtol=2e-3, atol=3e-4)


def test_convert_granitemoe_parity(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_gmoe")
    n_vocab = _byte_level_tokenizer(d / "tokenizer.json")
    (d / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>"}))
    hf_cfg = transformers.GraniteMoeConfig(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        logits_scaling=3.0, attention_multiplier=0.1,
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    hf_model = transformers.GraniteMoeForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == "granitemoe"
    assert model.cfg.n_expert == 4
    toks = np.array([[3, 45, 99, 7]], np.int32)
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    ours, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                      jnp.asarray(pos),
                      mask=np.tril(np.ones((1, n, n), bool)),
                      compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf_model(torch.tensor(toks, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], theirs[0].numpy(),
                               rtol=3e-3, atol=3e-3)


def test_convert_baichuan_wpack_split(tmp_path_factory):
    """Synthetic baichuan checkpoint (fused W_pack): the split+permute must
    reproduce an identical plain-llama conversion of the same weights."""
    import shutil

    from safetensors import safe_open
    from safetensors.numpy import save_file

    base = tmp_path_factory.mktemp("hf_bc")
    n_vocab = _byte_level_tokenizer(base / "tokenizer.json")
    (base / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>"}))
    hf_cfg = transformers.LlamaConfig(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(str(base), safe_serialization=True)
    llama_gguf = str(base / "llama.gguf")
    convert(str(base), llama_gguf, "f32")

    # rewrite the same checkpoint with fused W_pack + baichuan model_type
    bc = tmp_path_factory.mktemp("hf_bc2")
    shutil.copy(base / "tokenizer.json", bc / "tokenizer.json")
    shutil.copy(base / "tokenizer_config.json", bc / "tokenizer_config.json")
    cfg = json.loads((base / "config.json").read_text())
    cfg["model_type"] = "baichuan"
    (bc / "config.json").write_text(json.dumps(cfg))
    tensors = {}
    with safe_open(str(base / "model.safetensors"), framework="np") as sf:
        for name in sf.keys():
            tensors[name] = sf.get_tensor(name)
    for il in range(2):
        pre = f"model.layers.{il}.self_attn."
        tensors[pre + "W_pack.weight"] = np.concatenate(
            [tensors.pop(pre + "q_proj.weight"),
             tensors.pop(pre + "k_proj.weight"),
             tensors.pop(pre + "v_proj.weight")], axis=0)
    save_file(tensors, str(bc / "model.safetensors"))
    bc_gguf = str(bc / "baichuan.gguf")
    convert(str(bc), bc_gguf, "f32")

    m1 = load_model(llama_gguf)
    m2 = load_model(bc_gguf)
    assert m2.cfg.arch == "baichuan"
    toks = np.array([[3, 45, 99, 7]], np.int32)
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    mask = np.tril(np.ones((1, n, n), bool))
    l1, _ = forward(m1.params, m1.cfg, jnp.asarray(toks), jnp.asarray(pos),
                    mask=mask, compute_dtype=jnp.float32)
    l2, _ = forward(m2.params, m2.cfg, jnp.asarray(toks), jnp.asarray(pos),
                    mask=mask, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=1e-5, atol=1e-5)


def _parity_case(tmp_path_factory, tag, hf_cfg_cls, hf_model_cls, arch,
                 cfg_kwargs, tol=3e-3, tok_ids=(3, 45, 99, 7)):
    d = tmp_path_factory.mktemp(f"hf_{tag}")
    n_vocab = _byte_level_tokenizer(d / "tokenizer.json")
    (d / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>"}))
    torch.manual_seed(7)
    hf_model = hf_model_cls(hf_cfg_cls(vocab_size=n_vocab, **cfg_kwargs)).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == arch
    toks = np.array([list(tok_ids)], np.int32)
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    ours, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                      jnp.asarray(pos),
                      mask=np.tril(np.ones((1, n, n), bool)),
                      compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf_model(torch.tensor(toks, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], theirs[0].numpy(),
                               rtol=tol, atol=tol)


def test_convert_olmo_parity(tmp_path_factory):
    """olmo v1: non-parametric LN, converter-permuted q/k (NORM rope),
    clip_qkv → f_clamp_kqv (reference llm_build_olmo ggml_clamp)."""
    _parity_case(
        tmp_path_factory, "olmo", transformers.OlmoConfig,
        transformers.OlmoForCausalLM, "olmo",
        dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, clip_qkv=0.05,
             max_position_embeddings=64, rope_theta=10000.0,
             tie_word_embeddings=False), tol=3e-4)


def test_convert_olmoe_parity(tmp_path_factory):
    _parity_case(
        tmp_path_factory, "olmoe", transformers.OlmoeConfig,
        transformers.OlmoeForCausalLM, "olmoe",
        dict(hidden_size=64, intermediate_size=96, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             num_experts=4, num_experts_per_tok=2,
             max_position_embeddings=64, rms_norm_eps=1e-6,
             tie_word_embeddings=False))


def test_convert_qwen3moe_parity(tmp_path_factory):
    _parity_case(
        tmp_path_factory, "q3moe", transformers.Qwen3MoeConfig,
        transformers.Qwen3MoeForCausalLM, "qwen3moe",
        dict(hidden_size=64, intermediate_size=128, moe_intermediate_size=96,
             num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
             head_dim=16, num_experts=4, num_experts_per_tok=2,
             decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=True,
             max_position_embeddings=64, rms_norm_eps=1e-6,
             tie_word_embeddings=False))


def test_convert_starcoder_parity(tmp_path_factory):
    _parity_case(
        tmp_path_factory, "bigcode", transformers.GPTBigCodeConfig,
        transformers.GPTBigCodeForCausalLM, "starcoder",
        dict(n_embd=64, n_inner=128, n_layer=2, n_head=4,
             multi_query=True, n_positions=64, layer_norm_epsilon=1e-5))


def test_convert_bert_parity(tmp_path_factory):
    """BERT encoder conversion: WordPiece tokenizer + encoder tensor map;
    hidden states match HF BertModel."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    d = tmp_path_factory.mktemp("hf_bert")
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello", "world",
             "he", "##llo", "a", "b", "c"] + [f"w{i}" for i in range(116)]
    vocab = {t: i for i, t in enumerate(words)}
    tok = Tokenizer(models.WordPiece(vocab=vocab, unk_token="[UNK]"))
    tok.normalizer = normalizers.Lowercase()
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "cls_token": "[CLS]", "sep_token": "[SEP]"}))

    hf_cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", layer_norm_eps=1e-12,
    )
    torch.manual_seed(11)
    hf_model = transformers.BertModel(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")

    model = load_model(out)
    assert model.cfg.arch == "bert"
    assert model.vocab.sep_id == 3 and model.vocab.bos_id == 2
    from llama_cpp_dsp_tpu.models.bert import bert_forward

    toks = np.array([[2, 5, 6, 3]], np.int32)  # [CLS] hello world [SEP]
    ours = np.asarray(bert_forward(model.params, model.cfg,
                                   jnp.asarray(toks), pooling="none"))
    with torch.no_grad():
        want = hf_model(torch.tensor(toks, dtype=torch.long)
                        ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours[0], want[0], rtol=2e-3, atol=2e-3)


def test_convert_t5_parity(tmp_path_factory):
    """T5 encoder-decoder conversion (Unigram tokenizer + enc./dec. maps):
    decoder logits match HF."""
    from tokenizers import Tokenizer, models as tok_models

    d = tmp_path_factory.mktemp("hf_t5")
    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)] + [
        (f"▁w{i}", -float(i + 1)) for i in range(93)]
    tok = Tokenizer(tok_models.Unigram(pieces, unk_id=2))
    tok.save(str(d / "tokenizer.json"))

    hf_cfg = transformers.T5Config(
        vocab_size=96, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dropout_rate=0.0,
        feed_forward_proj="relu", tie_word_embeddings=True,
    )
    torch.manual_seed(21)
    hf_model = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")

    from llama_cpp_dsp_tpu.models.t5 import t5_decode, t5_encode
    from llama_cpp_dsp_tpu.runtime.loader import load_t5

    cfg, params, vocab, tokenizer, _ = load_t5(out)
    assert cfg.rel_buckets == 8 and cfg.rel_max_distance == 32
    assert cfg.tie_embeddings
    src = np.array([[4, 17, 9, 1]], np.int32)
    tgt = np.array([[0, 8, 3]], np.int32)
    enc = t5_encode(params, cfg, jnp.asarray(src))
    ours = np.asarray(t5_decode(params, cfg, jnp.asarray(tgt), enc))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(src, dtype=torch.long),
                        decoder_input_ids=torch.tensor(tgt, dtype=torch.long)
                        ).logits.numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_convert_nemotron_parity(tmp_path_factory):
    _parity_case(
        tmp_path_factory, "nemotron", transformers.NemotronConfig,
        transformers.NemotronForCausalLM, "nemotron",
        dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             partial_rotary_factor=0.5, hidden_act="relu2",
             max_position_embeddings=64, norm_eps=1e-5,
             tie_word_embeddings=False))


def test_convert_glm4_parity(tmp_path_factory):
    _parity_case(
        tmp_path_factory, "glm", transformers.GlmConfig,
        transformers.GlmForCausalLM, "glm4",
        dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             partial_rotary_factor=0.5, max_position_embeddings=64,
             rms_norm_eps=1e-5, tie_word_embeddings=False,
             pad_token_id=0), tol=3e-4)


def test_convert_deepseek_v3_parity(tmp_path_factory):
    """DeepseekV3 → deepseek2: MLA projections, sigmoid router with
    e_score_correction_bias (selection-only), shared expert, leading dense
    block, MoE expert stacking."""
    _parity_case(
        tmp_path_factory, "dsv3", transformers.DeepseekV3Config,
        transformers.DeepseekV3ForCausalLM, "deepseek2",
        dict(hidden_size=32, intermediate_size=64, moe_intermediate_size=48,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=4, n_routed_experts=4, n_shared_experts=1,
             num_experts_per_tok=2, first_k_dense_replace=1, kv_lora_rank=16,
             q_lora_rank=24, qk_nope_head_dim=8, qk_rope_head_dim=8,
             v_head_dim=8, routed_scaling_factor=1.5, scoring_func="sigmoid",
             norm_topk_prob=True, n_group=1, topk_group=1,
             max_position_embeddings=64, rms_norm_eps=1e-6,
             tie_word_embeddings=False), tol=5e-3)


def test_convert_llama4_parity(tmp_path_factory):
    """Llama4 text model: fused expert gate_up/down transposed splits,
    interleaved MoE (dense layer 0 / MoE layer 1), NoPE step, qk l2-norm,
    intermediate_size_mlp swap."""
    _parity_case(
        tmp_path_factory, "llama4", transformers.Llama4TextConfig,
        transformers.Llama4ForCausalLM, "llama4",
        dict(hidden_size=32, intermediate_size=64, intermediate_size_mlp=80,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, head_dim=8, num_local_experts=4,
             num_experts_per_tok=1, interleave_moe_layer_step=2,
             use_qk_norm=True, max_position_embeddings=64,
             rms_norm_eps=1e-5, tie_word_embeddings=False), tol=6e-3)


def test_convert_falcon_mamba_parity(tmp_path_factory):
    """falcon_mamba → mamba with ssm.dt_b_c_rms (rms on dt/B/C splits)."""
    d, n_vocab = _tok_dir(tmp_path_factory, "hf_falcon_mamba")
    hf_cfg = transformers.FalconMambaConfig(
        vocab_size=n_vocab, hidden_size=32, intermediate_size=64,
        state_size=8, num_hidden_layers=2, conv_kernel=4, time_step_rank=4,
        use_cache=False)
    torch.manual_seed(31)
    hf_model = transformers.FalconMambaForCausalLM(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == "mamba" and model.cfg.ssm_dt_b_c_rms

    from llama_cpp_dsp_tpu.models.mamba import forward as mamba_forward

    toks = np.array([[3, 45, 99, 7]], np.int32)
    ours, _ = mamba_forward(model.params, model.cfg, jnp.asarray(toks))
    with torch.no_grad():
        want = hf_model(torch.tensor(toks, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours)[0], want[0],
                               rtol=3e-3, atol=3e-3)


def test_convert_roberta_parity(tmp_path_factory):
    """Roberta → bert: 'roberta.' prefix strip, position-embedding rows
    chopped by pad_token_id+1, BPE tokenizer."""
    d, n_vocab = _tok_dir(tmp_path_factory, "hf_roberta")
    hf_cfg = transformers.RobertaConfig(
        vocab_size=n_vocab, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=66, type_vocab_size=1,
        hidden_act="gelu", layer_norm_eps=1e-5, pad_token_id=1)
    torch.manual_seed(13)
    hf_model = transformers.RobertaModel(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == "bert"
    assert model.cfg.n_ctx_train == 64  # 66 - (pad_token_id + 1)

    from llama_cpp_dsp_tpu.models.bert import bert_forward

    toks = np.array([[3, 45, 99, 7]], np.int32)
    ours = np.asarray(bert_forward(model.params, model.cfg,
                                   jnp.asarray(toks), pooling="none"))
    with torch.no_grad():
        # HF roberta offsets positions by pad+1 internally; the converter
        # chops those rows so row 0 of our table == HF position pad+1
        want = hf_model(torch.tensor(toks, dtype=torch.long)
                        ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours[0], want[0], rtol=2e-3, atol=2e-3)


def test_convert_mt5_parity(tmp_path_factory):
    """mt5 model_type routes through the T5 path (gated-gelu FFN)."""
    from tokenizers import Tokenizer, models as tok_models

    d = tmp_path_factory.mktemp("hf_mt5")
    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)] + [
        (f"▁w{i}", -float(i + 1)) for i in range(93)]
    tok = Tokenizer(tok_models.Unigram(pieces, unk_id=2))
    tok.save(str(d / "tokenizer.json"))
    hf_cfg = transformers.MT5Config(
        vocab_size=96, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=True)
    torch.manual_seed(23)
    hf_model = transformers.MT5ForConditionalGeneration(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")

    from llama_cpp_dsp_tpu.models.t5 import t5_decode, t5_encode
    from llama_cpp_dsp_tpu.runtime.loader import load_t5

    cfg, params, vocab, tokenizer, _ = load_t5(out)
    src = np.array([[4, 17, 9, 1]], np.int32)
    tgt = np.array([[0, 8, 3]], np.int32)
    enc = t5_encode(params, cfg, jnp.asarray(src))
    ours = np.asarray(t5_decode(params, cfg, jnp.asarray(tgt), enc))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(src, dtype=torch.long),
                        decoder_input_ids=torch.tensor(tgt, dtype=torch.long)
                        ).logits.numpy()
    np.testing.assert_allclose(ours, want, rtol=3e-3, atol=3e-3)


def test_convert_qwen2_5_vl_parity(tmp_path_factory):
    """Qwen2.5-VL text side → qwen2vl arch (M-RoPE sections, vision tower
    skipped)."""
    d, n_vocab = _tok_dir(tmp_path_factory, "hf_qwen25vl")
    text_cfg = dict(
        vocab_size=n_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]})
    hf_cfg = transformers.Qwen2_5_VLConfig(text_config=text_cfg)
    torch.manual_seed(17)
    hf_model = transformers.Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == "qwen2vl"
    assert model.cfg.mrope_sections == (2, 3, 3, 0)

    toks = np.array([[3, 45, 99, 7, 150]], np.int32)
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    ours, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                      jnp.asarray(pos),
                      mask=np.tril(np.ones((1, n, n), bool)),
                      compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf_model(input_ids=torch.tensor(toks, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], theirs[0].numpy(),
                               rtol=3e-3, atol=3e-3)


def test_convert_dbrx_parity(tmp_path_factory):
    """dbrx: transformer.blocks.* naming, fused clamped Wqkv, pre-stacked
    flat expert tensors [E*ff, d] without .weight suffixes (w1/v1/w2; w2
    transposes to d-major rows — reference DbrxModel.modify_tensors)."""
    _parity_case(
        tmp_path_factory, "dbrx", transformers.DbrxConfig,
        transformers.DbrxForCausalLM, "dbrx",
        dict(d_model=64, n_heads=4, n_layers=2, max_seq_len=64,
             attn_config={"kv_n_heads": 2, "clip_qkv": 6.0,
                          "rope_theta": 10000.0},
             ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4,
                         "moe_top_k": 2, "moe_jitter_eps": None},
             tie_word_embeddings=False), tol=3e-4)


def test_convert_bloom_parity(tmp_path_factory):
    """bloom: ALiBi positions, fused qkv (per-head [q|k|v] interleave),
    embedding layernorm, tied embeddings."""
    _parity_case(
        tmp_path_factory, "bloom", transformers.BloomConfig,
        transformers.BloomForCausalLM, "bloom",
        dict(hidden_size=64, n_head=4, n_layer=2,
             layer_norm_epsilon=1e-5, tie_word_embeddings=True))


def test_convert_mpt_parity(tmp_path_factory):
    """mpt: ALiBi, no biases, fused Wqkv, ln norms."""
    _parity_case(
        tmp_path_factory, "mpt", transformers.MptConfig,
        transformers.MptForCausalLM, "mpt",
        dict(d_model=64, n_heads=4, n_layers=2, expansion_ratio=2,
             max_seq_len=64))


def test_convert_gemma_parity(tmp_path_factory):
    """gemma v1: embd scale sqrt(C), gelu_tanh gated FFN, (1+w) rms norms,
    tied embeddings, head_dim independent of C/H."""
    _parity_case(
        tmp_path_factory, "gemma", transformers.GemmaConfig,
        transformers.GemmaForCausalLM, "gemma",
        dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=1, head_dim=16,
             max_position_embeddings=64, rms_norm_eps=1e-6,
             hidden_act="gelu_pytorch_tanh"))


def test_convert_granite_parity(tmp_path_factory):
    """granite: the four multipliers (embedding/residual/attention/logits)."""
    _parity_case(
        tmp_path_factory, "granite", transformers.GraniteConfig,
        transformers.GraniteForCausalLM, "granite",
        dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=64, rms_norm_eps=1e-6,
             embedding_multiplier=2.0, residual_multiplier=0.5,
             logits_scaling=4.0, attention_multiplier=0.1,
             tie_word_embeddings=False))


def test_convert_phi2_parity(tmp_path_factory):
    """phi2: partial rotary, parallel residual, ln norms with bias,
    fc biases, final lm_head bias."""
    _parity_case(
        tmp_path_factory, "phi", transformers.PhiConfig,
        transformers.PhiForCausalLM, "phi2",
        dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=4,
             partial_rotary_factor=0.5, max_position_embeddings=64,
             layer_norm_eps=1e-5, tie_word_embeddings=False))


def test_convert_starcoder2_parity(tmp_path_factory):
    """starcoder2: ln norms + biases everywhere, gelu non-gated FFN."""
    _parity_case(
        tmp_path_factory, "sc2", transformers.Starcoder2Config,
        transformers.Starcoder2ForCausalLM, "starcoder2",
        dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=64, norm_epsilon=1e-5,
             sliding_window=None, tie_word_embeddings=False))


def test_convert_qwen2moe_parity(tmp_path_factory):
    """qwen2moe: shared expert with sigmoid(gate_inp_shexp) scaling,
    router WITHOUT renorm, per-expert ff width."""
    _parity_case(
        tmp_path_factory, "q2moe", transformers.Qwen2MoeConfig,
        transformers.Qwen2MoeForCausalLM, "qwen2moe",
        dict(hidden_size=64, intermediate_size=128, moe_intermediate_size=48,
             shared_expert_intermediate_size=96, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, num_experts=4,
             num_experts_per_tok=2, decoder_sparse_step=1,
             norm_topk_prob=False, max_position_embeddings=64,
             rms_norm_eps=1e-6, tie_word_embeddings=False))


def test_convert_cohere2_parity(tmp_path_factory):
    """cohere2: SWA-every-4th pattern, rope only on SWA layers, ln norm,
    parallel residual, logit scale, tied embeddings."""
    _parity_case(
        tmp_path_factory, "coh2", transformers.Cohere2Config,
        transformers.Cohere2ForCausalLM, "cohere2",
        dict(hidden_size=64, intermediate_size=128, num_hidden_layers=4,
             num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=64, layer_norm_eps=1e-5,
             sliding_window=8, sliding_window_pattern=4, logit_scale=0.25,
             rope_theta=10000.0))


def test_convert_gemma3_parity(tmp_path_factory):
    """gemma3: pre+post sublayer norms, qk rms-norm, SWA-5-of-6 pattern with
    a separate local rope base (10k local / 1M full), (1+w) norms, tied
    embeddings, query_pre_attn_scalar scaling."""
    _parity_case(
        tmp_path_factory, "g3", transformers.Gemma3TextConfig,
        transformers.Gemma3ForCausalLM, "gemma3",
        dict(hidden_size=64, intermediate_size=128, num_hidden_layers=7,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             query_pre_attn_scalar=16, sliding_window=8,
             max_position_embeddings=64, rms_norm_eps=1e-6,
             rope_theta=1000000.0, rope_local_base_freq=10000.0,
             attn_logit_softcapping=None, final_logit_softcapping=None),
        tol=5e-3)


def test_convert_lora_roundtrip(converted, tmp_path):
    """PEFT adapter dir → GGUF adapter (convert_lora, reference
    convert_lora_to_gguf.py role) → load_lora/apply_lora: logits must match
    the HF model with the deltas merged (incl. the q/k row permutation that
    lora_b must follow)."""
    from safetensors.numpy import save_file

    from llama_cpp_dsp_tpu.runtime.adapter import apply_lora, load_lora
    from llama_cpp_dsp_tpu.tools.convert_hf import convert_lora

    d, gguf_path, hf_model = converted
    rng = np.random.default_rng(5)
    r, alpha = 4, 32.0
    adapter = tmp_path / "peft"
    adapter.mkdir()
    (adapter / "adapter_config.json").write_text(json.dumps({
        "peft_type": "LORA", "r": r, "lora_alpha": alpha,
        "target_modules": ["q_proj", "k_proj", "v_proj", "gate_proj"],
        "base_model_name_or_path": "tiny-llama-test"}))
    tensors = {}
    merged = {}
    for li in (0, 1):
        for mod, hf_full in (
                ("self_attn.q_proj", f"model.layers.{li}.self_attn.q_proj"),
                ("self_attn.k_proj", f"model.layers.{li}.self_attn.k_proj"),
                ("self_attn.v_proj", f"model.layers.{li}.self_attn.v_proj"),
                ("mlp.gate_proj", f"model.layers.{li}.mlp.gate_proj")):
            w = hf_model.get_parameter(hf_full + ".weight")
            out_d, in_d = w.shape
            a = (rng.standard_normal((r, in_d)) * 0.05).astype(np.float32)
            b = (rng.standard_normal((out_d, r)) * 0.05).astype(np.float32)
            key = f"base_model.model.model.layers.{li}.{mod}"
            tensors[key + ".lora_A.weight"] = a
            tensors[key + ".lora_B.weight"] = b
            merged[hf_full + ".weight"] = (alpha / r) * (b @ a)
    save_file(tensors, str(adapter / "adapter_model.safetensors"))

    out = str(tmp_path / "adapter.gguf")
    convert_lora(str(adapter), out, base_dir=str(d))

    model = load_model(gguf_path)
    params = apply_lora(model.params, load_lora(out))
    toks = np.array([[3, 45, 99, 7, 150]], np.int32)
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    ours, _ = forward(params, model.cfg, jnp.asarray(toks), jnp.asarray(pos),
                      mask=np.tril(np.ones((1, n, n), bool)),
                      compute_dtype=jnp.float32)

    import copy
    hf2 = copy.deepcopy(hf_model)
    with torch.no_grad():
        for name, delta in merged.items():
            hf2.get_parameter(name).add_(torch.tensor(delta))
        theirs = hf2(torch.tensor(toks, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], theirs[0].numpy(),
                               rtol=4e-3, atol=4e-3)
