"""Merge LoRA adapter(s) into a base GGUF (reference examples/export-lora):
W' = W + scale · (B @ A) per adapted tensor; output re-emitted at --outtype
(f16 default, like the reference's merged output).

Usage: python -m llama_cpp_dsp_tpu.tools.export_lora -m base.gguf
           --lora adapter.gguf [--lora-scaled adapter2.gguf 0.5]
           -o merged.gguf [--outtype f16|f32|q8_0|q4_k...]
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

log = logging.getLogger(__name__)


def merge(base_path: str, loras: list[tuple[str, float]], out_path: str,
          outtype: str = "f16") -> None:
    from ..gguf.constants import GGMLType
    from ..gguf.reader import GGUFModel
    from ..gguf.writer import GGUFWriter
    from ..quant.ref_numpy import dequantize, quantize
    from ..runtime.adapter import load_lora

    qname = outtype.upper()
    qtype = {
        "F32": GGMLType.F32, "F16": GGMLType.F16, "BF16": GGMLType.BF16,
        "Q8_0": GGMLType.Q8_0, "Q4_0": GGMLType.Q4_0,
        "Q4_K": GGMLType.Q4_K, "Q4_K_M": GGMLType.Q4_K,
        "Q5_K": GGMLType.Q5_K, "Q6_K": GGMLType.Q6_K,
    }.get(qname)
    if qtype is None:
        raise ValueError(f"unsupported outtype {outtype}")

    adapters = [(load_lora(p), s) for p, s in loras]
    # collect per-tensor deltas keyed by the GGUF base name (adapter ab is
    # keyed by the tensor base, e.g. "blk.3.attn_q")
    deltas: dict[str, np.ndarray] = {}
    for ad, user_scale in adapters:
        s = ad.scale(user_scale)
        for name, (a, b) in ad.ab.items():
            # delta = B @ A (reference llama_adapter_lora merge), pre-scaled
            d = (np.asarray(b, np.float32) @ np.asarray(a, np.float32)) * s
            key = name if name.endswith(".weight") else name + ".weight"
            deltas[key] = deltas.get(key, 0) + d

    gm = GGUFModel.load(base_path)
    arch = str(gm.kv.get("general.architecture", "llama"))
    w = GGUFWriter(out_path, arch)
    for k, v in gm.kv.items():
        if k == "general.architecture":
            continue
        w.add_kv(k, v)
    n_merged = 0
    for name, info in gm.tensors.items():
        arr = dequantize(info.data, info.ggml_type, info.np_shape)
        arr = np.asarray(arr, np.float32)
        if name in deltas:
            arr = arr + deltas[name].reshape(arr.shape)
            n_merged += 1
        is_matrix = arr.ndim >= 2 and "norm" not in name
        t = qtype if is_matrix else GGMLType.F32
        if t in (GGMLType.F32,):
            w.add_tensor(name, arr.astype(np.float32))
        elif t == GGMLType.F16:
            w.add_tensor(name, arr.astype(np.float16))
        else:
            k_dim = arr.shape[-1]
            block = 256 if t in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K) else 32
            if k_dim % block:
                w.add_tensor(name, arr.astype(np.float16))
            else:
                raw = quantize(arr.reshape(-1, k_dim), t)
                w.add_tensor(name, raw, ggml_type=t,
                             ne_shape=tuple(reversed(arr.shape)))
    w.write()
    log.info("merged %d adapted tensors into %s", n_merged, out_path)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--lora", action="append", default=[],
                    help="adapter gguf (scale 1.0); repeatable")
    ap.add_argument("--lora-scaled", nargs=2, action="append", default=[],
                    metavar=("PATH", "SCALE"))
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--outtype", default="f16")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    loras = [(p, 1.0) for p in args.lora] + [
        (p, float(s)) for p, s in args.lora_scaled]
    if not loras:
        ap.error("at least one --lora/--lora-scaled required")
    merge(args.model, loras, args.outfile, args.outtype)
    return 0


if __name__ == "__main__":
    sys.exit(main())
