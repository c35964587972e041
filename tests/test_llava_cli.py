"""llava-cli parity (reference examples/llava/llava-cli.cpp) and CLI
speculative decoding (-md, reference examples/speculative)."""

import numpy as np
import pytest

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    build_tiny_llama(str(path), qtype=0)  # f32
    return str(path)


def _write_mmproj(path: str, proj_dim: int) -> None:
    """Tiny CLIP mmproj GGUF whose projector outputs proj_dim (= LLM n_embd)."""
    from llama_cpp_dsp_tpu.gguf.writer import GGUFWriter
    from llama_cpp_dsp_tpu.models.clip import _CLIP_GLOBAL, _CLIP_LAYER

    rng = np.random.default_rng(0)
    n_embd, n_ff, n_layers, n_heads = 32, 64, 2, 4
    image_size, patch_size = 28, 14

    def r(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w = GGUFWriter(path, "clip")
    w.add_uint32("clip.vision.image_size", image_size)
    w.add_uint32("clip.vision.patch_size", patch_size)
    w.add_uint32("clip.vision.embedding_length", n_embd)
    w.add_uint32("clip.vision.feed_forward_length", n_ff)
    w.add_uint32("clip.vision.block_count", n_layers)
    w.add_uint32("clip.vision.attention.head_count", n_heads)
    w.add_uint32("clip.vision.projection_dim", proj_dim)
    n_pos = (image_size // patch_size) ** 2 + 1
    glob = {
        "patch_embd": r(n_embd, 3, patch_size, patch_size),
        "class_embd": r(n_embd),
        "pos_embd": r(n_pos, n_embd),
        "pre_ln": np.ones(n_embd, np.float32),
        "pre_ln_b": np.zeros(n_embd, np.float32),
        "mm_0": r(proj_dim, n_embd),
        "mm_0_b": np.zeros(proj_dim, np.float32),
        "mm_2": r(proj_dim, proj_dim),
        "mm_2_b": np.zeros(proj_dim, np.float32),
    }
    inv_global = {v: k for k, v in _CLIP_GLOBAL.items()}
    inv_layer = {v: k for k, v in _CLIP_LAYER.items()}
    for key, arr in glob.items():
        w.add_tensor(inv_global[key], np.ascontiguousarray(arr))
    for i in range(n_layers):
        layer = {
            "ln1": np.ones(n_embd, np.float32), "ln1_b": np.zeros(n_embd, np.float32),
            "ln2": np.ones(n_embd, np.float32), "ln2_b": np.zeros(n_embd, np.float32),
            "attn_q": r(n_embd, n_embd), "attn_q_b": np.zeros(n_embd, np.float32),
            "attn_k": r(n_embd, n_embd), "attn_k_b": np.zeros(n_embd, np.float32),
            "attn_v": r(n_embd, n_embd), "attn_v_b": np.zeros(n_embd, np.float32),
            "attn_out": r(n_embd, n_embd), "attn_out_b": np.zeros(n_embd, np.float32),
            "ffn_up": r(n_ff, n_embd), "ffn_up_b": np.zeros(n_ff, np.float32),
            "ffn_down": r(n_embd, n_ff), "ffn_down_b": np.zeros(n_embd, np.float32),
        }
        for key, arr in layer.items():
            w.add_tensor(f"v.blk.{i}.{inv_layer[key]}", np.ascontiguousarray(arr))
    w.write()


def test_eval_embd_matches_eval_tokens(tiny):
    """Feeding a token's own embedding row through eval_embd must reproduce
    eval_tokens logits (the llava injection path is exact)."""
    import jax.numpy as jnp

    from llama_cpp_dsp_tpu.ops import take_rows
    from llama_cpp_dsp_tpu.runtime.context import LlamaContext
    from llama_cpp_dsp_tpu.runtime.loader import load_model

    model = load_model(tiny)
    ctx1 = LlamaContext(model, n_ctx=64, prefill_buckets=(8,))
    ctx2 = LlamaContext(model, n_ctx=64, prefill_buckets=(8,))
    toks = [3, 5, 7]
    l1 = ctx1.eval_tokens(toks)
    embd = np.asarray(take_rows(ctx2.params["token_embd"],
                                jnp.asarray([toks]), dtype=jnp.float32))[0]
    l2 = ctx2.eval_embd(embd)
    assert ctx2.n_past == len(toks)
    np.testing.assert_allclose(l1, l2, rtol=2e-2, atol=2e-2)


def test_llava_cli_end_to_end(tiny, tmp_path, capsysbinary):
    from llama_cpp_dsp_tpu.tools.llava import main

    mmproj = str(tmp_path / "mmproj.gguf")
    _write_mmproj(mmproj, proj_dim=64)  # tiny llama n_embd
    img = str(tmp_path / "img.npy")
    np.save(img, np.random.default_rng(1).integers(
        0, 255, (28, 28, 3)).astype(np.uint8))
    rc = main(["-m", tiny, "--mmproj", mmproj, "--image", img,
               "-p", "USER:<image>\ndescribe\nASSISTANT:", "-n", "4",
               "--temp", "0", "-c", "64"])
    assert rc == 0
    out = capsysbinary.readouterr()
    assert b"patch embeddings" in out.err


def test_cli_speculative_greedy_identical(tiny, tmp_path, capsysbinary, monkeypatch):
    """Greedy -md (draft = target) output must byte-match the plain run."""
    from llama_cpp_dsp_tpu.tools.cli import main

    base = ["-m", tiny, "-p", "hello", "-n", "8", "--temp", "0", "-c", "64",
            "--no-display-prompt"]
    assert main(base) == 0
    plain = capsysbinary.readouterr().out
    assert main(base + ["-md", tiny, "--draft-max", "4"]) == 0
    cap = capsysbinary.readouterr()
    assert cap.out == plain
    assert b"drafted tokens accepted" in cap.err


def test_infill_fim_tokens(tiny):
    """FIM sequence construction + the no-FIM-tokens error path
    (reference examples/infill/infill.cpp)."""
    import pytest as _pytest

    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.tools.infill import build_fim_tokens, main

    model = load_model(tiny)
    with _pytest.raises(ValueError):
        build_fim_tokens(model.vocab, model.tokenizer, "a", "b")
    model.vocab.fim_pre_id = 3
    model.vocab.fim_suf_id = 4
    model.vocab.fim_mid_id = 5
    pre = model.tokenizer.encode("aa", add_special=False)
    suf = model.tokenizer.encode("bb", add_special=False)
    bos = ([model.vocab.bos_id]
           if model.vocab.bos_id >= 0 and model.vocab.add_bos else [])
    ids = build_fim_tokens(model.vocab, model.tokenizer, "aa", "bb")
    assert ids == bos + [3] + pre + [4] + suf + [5]
    ids_spm = build_fim_tokens(model.vocab, model.tokenizer, "aa", "bb",
                               spm=True)
    assert ids_spm == bos + [4] + suf + [3] + pre + [5]
    # CLI on a FIM-less model exits 1 cleanly
    with _pytest.raises(SystemExit):
        main(["-m", tiny, "--in-prefix", "x", "--in-suffix", "y", "-n", "2"])
