"""Model requantizer — capability mirror of llama_model_quantize
(reference src/llama-quant.cpp).

Per-tensor target-type selection follows llama_tensor_get_type
(llama-quant.cpp:220-310): output/token_embd overrides, attn_v/ffn_down
use_more_bits layer schedules for the _M ftypes, GQA/MoE bumps, and
block-size fallbacks. Optional imatrix importance weights feed the
weighted quantizer fits (quantize_row_*_impl).

Usage: python -m llama_cpp_dsp_tpu.tools.quantize in.gguf out.gguf Q4_K_M
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, FType, GGMLType, Keys
from ..gguf.reader import GGUFModel
from ..gguf.writer import GGUFWriter
from ..quant import ref_numpy as refq

FTYPE_DEFAULT_TYPE: dict[FType, GGMLType] = {
    FType.ALL_F32: GGMLType.F32,
    FType.MOSTLY_F16: GGMLType.F16,
    FType.MOSTLY_BF16: GGMLType.BF16,
    FType.MOSTLY_Q4_0: GGMLType.Q4_0,
    FType.MOSTLY_Q4_1: GGMLType.Q4_1,
    FType.MOSTLY_Q5_0: GGMLType.Q5_0,
    FType.MOSTLY_Q5_1: GGMLType.Q5_1,
    FType.MOSTLY_Q8_0: GGMLType.Q8_0,
    FType.MOSTLY_Q2_K: GGMLType.Q2_K,
    FType.MOSTLY_Q2_K_S: GGMLType.Q2_K,
    FType.MOSTLY_Q3_K_S: GGMLType.Q3_K,
    FType.MOSTLY_Q3_K_M: GGMLType.Q3_K,
    FType.MOSTLY_Q3_K_L: GGMLType.Q3_K,
    FType.MOSTLY_Q4_K_S: GGMLType.Q4_K,
    FType.MOSTLY_Q4_K_M: GGMLType.Q4_K,
    FType.MOSTLY_Q5_K_S: GGMLType.Q5_K,
    FType.MOSTLY_Q5_K_M: GGMLType.Q5_K,
    FType.MOSTLY_Q6_K: GGMLType.Q6_K,
    FType.MOSTLY_TQ1_0: GGMLType.TQ1_0,
    FType.MOSTLY_TQ2_0: GGMLType.TQ2_0,
    FType.MOSTLY_IQ4_NL: GGMLType.IQ4_NL,
    FType.MOSTLY_IQ4_XS: GGMLType.IQ4_XS,
    FType.MOSTLY_IQ2_XXS: GGMLType.IQ2_XXS,
    FType.MOSTLY_IQ3_XXS: GGMLType.IQ3_XXS,
    FType.MOSTLY_IQ1_S: GGMLType.IQ1_S,
    FType.MOSTLY_IQ1_M: GGMLType.IQ1_M,
    FType.MOSTLY_IQ2_XS: GGMLType.IQ2_XS,
    FType.MOSTLY_IQ2_S: GGMLType.IQ2_S,
    FType.MOSTLY_IQ2_M: GGMLType.IQ2_S,
    FType.MOSTLY_IQ3_S: GGMLType.IQ3_S,
    FType.MOSTLY_IQ3_M: GGMLType.IQ3_S,
    FType.MOSTLY_IQ3_XS: GGMLType.IQ3_S,
}

FTYPE_NAMES = {
    "F32": FType.ALL_F32, "F16": FType.MOSTLY_F16, "BF16": FType.MOSTLY_BF16,
    "Q4_0": FType.MOSTLY_Q4_0, "Q4_1": FType.MOSTLY_Q4_1,
    "Q5_0": FType.MOSTLY_Q5_0, "Q5_1": FType.MOSTLY_Q5_1,
    "Q8_0": FType.MOSTLY_Q8_0,
    "Q2_K": FType.MOSTLY_Q2_K, "Q2_K_S": FType.MOSTLY_Q2_K_S,
    "Q3_K_S": FType.MOSTLY_Q3_K_S, "Q3_K_M": FType.MOSTLY_Q3_K_M,
    "Q3_K_L": FType.MOSTLY_Q3_K_L, "Q3_K": FType.MOSTLY_Q3_K_M,
    "Q4_K_S": FType.MOSTLY_Q4_K_S, "Q4_K_M": FType.MOSTLY_Q4_K_M,
    "Q5_K_S": FType.MOSTLY_Q5_K_S, "Q5_K_M": FType.MOSTLY_Q5_K_M,
    "Q6_K": FType.MOSTLY_Q6_K,
    "TQ1_0": FType.MOSTLY_TQ1_0, "TQ2_0": FType.MOSTLY_TQ2_0,
    "IQ4_NL": FType.MOSTLY_IQ4_NL, "IQ4_XS": FType.MOSTLY_IQ4_XS,
    "IQ2_XXS": FType.MOSTLY_IQ2_XXS, "IQ3_XXS": FType.MOSTLY_IQ3_XXS,
    "IQ1_S": FType.MOSTLY_IQ1_S, "IQ1_M": FType.MOSTLY_IQ1_M,
    "IQ2_XS": FType.MOSTLY_IQ2_XS, "IQ2_S": FType.MOSTLY_IQ2_S,
    "IQ2_M": FType.MOSTLY_IQ2_M, "IQ3_S": FType.MOSTLY_IQ3_S,
    "IQ3_M": FType.MOSTLY_IQ3_M, "IQ3_XS": FType.MOSTLY_IQ3_XS,
}

# block-size fallbacks when ne[0] % block != 0 (llama-quant.cpp:~430)
_FALLBACK = {
    GGMLType.Q2_K: GGMLType.Q4_0,
    GGMLType.Q3_K: GGMLType.Q4_1,
    GGMLType.Q4_K: GGMLType.Q5_0,
    GGMLType.Q5_K: GGMLType.Q5_1,
    GGMLType.Q6_K: GGMLType.Q8_0,
}


def use_more_bits(i_layer: int, n_layers: int) -> bool:
    """llama-quant.cpp:227."""
    return (
        i_layer < n_layers // 8
        or i_layer >= 7 * n_layers // 8
        or (i_layer - n_layers // 8) % 3 == 2
    )


class _QuantizeState:
    def __init__(self, kv: dict, has_output: bool, has_imatrix: bool):
        arch = str(kv.get(Keys.General.ARCHITECTURE, "llama"))
        self.arch = arch
        self.n_layers = int(kv.get(f"{arch}.block_count", 0))
        n_head = int(kv.get(f"{arch}.attention.head_count", 1) or 1)
        n_head_kv = int(kv.get(f"{arch}.attention.head_count_kv", n_head) or n_head)
        self.n_gqa = n_head // max(n_head_kv, 1)
        self.n_expert = int(kv.get(f"{arch}.expert_count", 0) or 0)
        self.has_output = has_output
        self.has_imatrix = has_imatrix
        self.i_attention_wv = 0
        self.i_ffn_down = 0
        self.i_ffn_gate = 0
        self.i_ffn_up = 0
        self.n_attention_wv = self.n_layers
        self.n_ffn_down = self.n_layers
        self.n_ffn_gate = self.n_layers
        self.n_ffn_up = self.n_layers


def tensor_get_type(qs: _QuantizeState, new_type: GGMLType, name: str, ne0: int,
                    ftype: FType) -> GGMLType:
    """Port of llama_tensor_get_type for the supported ftypes."""
    n_layer = qs.n_layers

    def layer_of(nm: str) -> int:
        if nm.startswith("blk."):
            return int(nm.split(".")[1])
        return 0

    iq_low = ftype in (FType.MOSTLY_IQ1_S, FType.MOSTLY_IQ1_M,
                       FType.MOSTLY_IQ2_XXS, FType.MOSTLY_IQ2_XS,
                       FType.MOSTLY_IQ2_S, FType.MOSTLY_IQ2_M)
    iq3 = ftype in (FType.MOSTLY_IQ3_XXS, FType.MOSTLY_IQ3_XS,
                    FType.MOSTLY_IQ3_S, FType.MOSTLY_IQ3_M)
    if name == "output.weight" or (not qs.has_output and name == "token_embd.weight"):
        qk_k = GGML_TYPE_TRAITS[new_type].block_size
        if ne0 % qk_k != 0:
            new_type = GGMLType.Q8_0
        elif iq_low:
            # llama-quant.cpp: low-bit IQ ftypes keep a Q5_K output head
            new_type = GGMLType.Q5_K
        elif new_type != GGMLType.Q8_0:
            new_type = GGMLType.Q6_K
    elif iq_low and name == "token_embd.weight":
        new_type = GGMLType.Q2_K
    elif iq_low and ("attn_v.weight" in name or "attn_k.weight" in name):
        new_type = GGMLType.Q4_K if "attn_v" in name else GGMLType.IQ3_S
        qs.i_attention_wv += "attn_v" in name
    elif iq3 and "attn_v.weight" in name:
        new_type = GGMLType.Q4_K if qs.n_gqa >= 4 else GGMLType.IQ3_S
        qs.i_attention_wv += 1
    elif name == "token_embd.weight":
        pass  # keep default for supported ftypes
    elif "attn_v.weight" in name:
        if ftype == FType.MOSTLY_Q2_K:
            new_type = GGMLType.Q4_K if qs.n_gqa >= 4 else GGMLType.Q3_K
        elif ftype == FType.MOSTLY_Q3_K_M:
            new_type = (GGMLType.Q5_K if qs.i_attention_wv < 2
                        else GGMLType.Q4_K)
        elif ftype == FType.MOSTLY_Q3_K_L:
            new_type = GGMLType.Q5_K
        elif ftype in (FType.MOSTLY_Q4_K_M, FType.MOSTLY_Q5_K_M) and use_more_bits(
            qs.i_attention_wv, qs.n_attention_wv
        ):
            new_type = GGMLType.Q6_K
        elif ftype == FType.MOSTLY_Q4_K_S and qs.i_attention_wv < 4:
            new_type = GGMLType.Q5_K
        if qs.n_expert == 8:
            new_type = GGMLType.Q8_0
        qs.i_attention_wv += 1
    elif "attn_k.weight" in name:
        if qs.n_expert == 8:
            new_type = GGMLType.Q8_0
    elif "ffn_down" in name:
        i_layer = layer_of(name) if qs.n_expert > 1 else qs.i_ffn_down
        if ftype == FType.MOSTLY_Q2_K:
            new_type = GGMLType.Q3_K
        elif ftype == FType.MOSTLY_Q3_K_M:
            new_type = (GGMLType.Q5_K if i_layer < n_layer // 16
                        else GGMLType.Q4_K
                        if qs.arch != "falcon" or use_more_bits(i_layer, n_layer)
                        else GGMLType.Q3_K)
        elif ftype == FType.MOSTLY_Q3_K_L:
            new_type = (GGMLType.Q4_K if qs.arch == "falcon"
                        else GGMLType.Q5_K)
        elif ftype == FType.MOSTLY_Q4_K_M:
            if use_more_bits(i_layer, n_layer):
                new_type = GGMLType.Q6_K
        elif ftype == FType.MOSTLY_Q5_K_M and use_more_bits(i_layer, n_layer):
            new_type = GGMLType.Q6_K
        elif ftype == FType.MOSTLY_Q4_K_S and i_layer < n_layer // 8:
            new_type = GGMLType.Q5_K
        elif (
            ftype in (FType.MOSTLY_Q4_0, FType.MOSTLY_Q5_0)
            and qs.has_imatrix
            and i_layer < n_layer // 8
        ):
            new_type = GGMLType.Q4_1 if ftype == FType.MOSTLY_Q4_0 else GGMLType.Q5_1
        qs.i_ffn_down += 1
    elif "attn_output.weight" in name:
        if qs.n_expert == 8:
            if ftype in (FType.MOSTLY_Q4_K_S, FType.MOSTLY_Q4_K_M,
                         FType.MOSTLY_Q2_K, FType.MOSTLY_Q3_K_S,
                         FType.MOSTLY_Q3_K_M):
                new_type = GGMLType.Q5_K
        elif ftype == FType.MOSTLY_Q2_K:
            new_type = GGMLType.Q3_K
        elif ftype == FType.MOSTLY_Q3_K_M:
            new_type = GGMLType.Q4_K
        elif ftype == FType.MOSTLY_Q3_K_L:
            new_type = GGMLType.Q5_K
    elif "attn_qkv.weight" in name:
        if ftype in (FType.MOSTLY_Q3_K_M, FType.MOSTLY_Q3_K_L):
            new_type = GGMLType.Q4_K
        elif ftype == FType.MOSTLY_Q4_K_M:
            new_type = GGMLType.Q5_K
        elif ftype == FType.MOSTLY_Q5_K_M:
            new_type = GGMLType.Q6_K

    # block-size fallback
    tr = GGML_TYPE_TRAITS[new_type]
    if ne0 % tr.block_size != 0:
        fb = _FALLBACK.get(new_type, GGMLType.F16)
        print(f"warning: {name}: ne0={ne0} not divisible by {tr.block_size}, "
              f"falling back {new_type.name} -> {fb.name}", file=sys.stderr)
        new_type = fb
    return new_type


_SKIP_QUANT_SUFFIXES = (
    "_norm.weight",
)
_SKIP_QUANT_NAMES = {"rope_freqs.weight", "output_norm.weight"}


def should_quantize(name: str, np_shape: tuple[int, ...]) -> bool:
    if len(np_shape) < 2:
        return False
    if not name.endswith("weight"):
        return False
    if name in _SKIP_QUANT_NAMES or any(name.endswith(s) for s in _SKIP_QUANT_SUFFIXES):
        return False
    return True


def quantize_model(
    src: str,
    dst: str,
    ftype: FType,
    *,
    imatrix: dict[str, np.ndarray] | None = None,
    output_tensor_type: GGMLType | None = None,
    token_embedding_type: GGMLType | None = None,
    pure: bool = False,
    nthread: int = 0,
) -> dict:
    gm = GGUFModel.load(src)
    default_type = FTYPE_DEFAULT_TYPE[ftype]
    qs = _QuantizeState(gm.kv, "output.weight" in gm.tensors, bool(imatrix))

    w = GGUFWriter(dst, gm.kv.get(Keys.General.ARCHITECTURE, "llama"))
    kv_types = gm.kv_types
    for key, val in gm.kv.items():
        if key == Keys.General.ARCHITECTURE:
            continue
        if key == Keys.General.FILE_TYPE:
            continue
        vtype, etype = kv_types.get(key, (None, None))
        w.add_kv(key, val, vtype, etype)
    w.add_uint32(Keys.General.FILE_TYPE, int(ftype))

    stats = {"in_bytes": 0, "out_bytes": 0, "tensors": 0}
    t0 = time.perf_counter()
    for name, info in gm.tensors.items():
        data = info.data
        stats["in_bytes"] += info.nbytes
        if not should_quantize(name, info.np_shape) or default_type in (
            GGMLType.F32,
        ):
            w.add_tensor(name, np.asarray(data), ggml_type=info.ggml_type,
                         ne_shape=info.shape)
            stats["out_bytes"] += info.nbytes
            continue
        new_type = default_type
        if output_tensor_type is not None and name == "output.weight":
            new_type = output_tensor_type
        elif token_embedding_type is not None and name == "token_embd.weight":
            new_type = token_embedding_type
        elif not pure:  # --pure disables the k-quant mixture schedule
            new_type = tensor_get_type(qs, new_type, name, info.shape[0], ftype)
        if new_type == info.ggml_type:
            w.add_tensor(name, np.asarray(data), ggml_type=info.ggml_type,
                         ne_shape=info.shape)
            stats["out_bytes"] += info.nbytes
            continue
        f32 = refq.dequantize(np.asarray(data), info.ggml_type).reshape(-1)
        qw = imatrix.get(name) if imatrix else None
        raw = refq.quantize_weighted(f32, new_type, qw, info.shape[0])
        w.add_tensor(name, raw, ggml_type=new_type, ne_shape=info.shape)
        stats["out_bytes"] += raw.nbytes
        stats["tensors"] += 1
        print(f"  {name}: {info.ggml_type.name} -> {new_type.name} "
              f"({raw.nbytes / 1e6:.1f} MB)", file=sys.stderr)
    w.write()
    gm.close()
    stats["seconds"] = time.perf_counter() - t0
    return stats


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-quantize", description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("ftype", choices=sorted(FTYPE_NAMES))
    ap.add_argument("--output-tensor-type", choices=[t.name for t in GGMLType], default=None)
    ap.add_argument("--token-embedding-type", choices=[t.name for t in GGMLType], default=None)
    ap.add_argument("--imatrix", help="imatrix file (from the imatrix tool)")
    ap.add_argument("--pure", action="store_true",
                    help="disable k-quant mixtures; quantize all tensors to "
                         "the ftype's base type (reference --pure)")
    from ..utils.args import parse_with_env

    args = parse_with_env(ap, argv)
    imatrix = None
    if args.imatrix:
        from .imatrix import load_imatrix

        imatrix = load_imatrix(args.imatrix)
    stats = quantize_model(
        args.src,
        args.dst,
        FTYPE_NAMES[args.ftype],
        imatrix=imatrix,
        pure=args.pure,
        output_tensor_type=GGMLType[args.output_tensor_type] if args.output_tensor_type else None,
        token_embedding_type=(
            GGMLType[args.token_embedding_type] if args.token_embedding_type else None
        ),
    )
    print(
        f"quantized {stats['tensors']} tensors: "
        f"{stats['in_bytes']/1e9:.2f} GB -> {stats['out_bytes']/1e9:.2f} GB "
        f"in {stats['seconds']:.1f}s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
