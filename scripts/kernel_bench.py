#!/usr/bin/env python3
"""Sweep fused-qmm kernel configs on the real chip.

Chained fori_loop keeps the measurement on-device and defeats the axon
runtime's (executable, args) memoization (each iteration's x depends on the
previous y). Reports effective HBM GB/s per config.

Usage: python scripts/kernel_bench.py [--kind q4_k] [--steps 64]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout
from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_fused
from llama_cpp_dsp_tpu.tools.synth import synth_qtensor
from llama_cpp_dsp_tpu.utils.jax_setup import setup_jax

KINDS = {"q4_k": GGMLType.Q4_K, "q6_k": GGMLType.Q6_K, "q8_0": GGMLType.Q8_0}


def bench(kind, n, k, tile_k, tile_n, steps, b=8, n_weights=8):
    """n_weights > 1 mimics the model's layer loop: consecutive kernel calls
    read DIFFERENT weights, so the next call's HBM fetch can overlap the
    current call's tail (what the full decode graph gets for free)."""
    rng = np.random.default_rng(0)
    kws = []
    for _ in range(n_weights):
        qt = synth_qtensor(rng, kind, (n, k))
        kws.append(jax.tree.map(jnp.asarray, to_kernel_layout(qt, tile_k)))
    x0 = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32) * 0.1)

    @jax.jit
    def run(kws, x0, steps):
        def body(i, x):
            for kw in kws:  # unrolled layer loop
                y = qmm_fused(x, kw, tile_n=tile_n)
                x = x0 + y[:, :1] * 1e-30  # data dep; negligible work
            return x

        return jax.lax.fori_loop(0, steps, body, x0)

    steps = max(1, steps // n_weights)

    # force with a host read — block_until_ready returns early through the
    # axon remote-relay PJRT backend (see bench.py)
    float(np.asarray(run(kws, x0, 2)[0, 0]))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(run(kws, x0, steps)[0, 0]))
    dt = (time.perf_counter() - t0) / (steps * n_weights)
    nbytes = kws[0].nbytes
    gbs = nbytes / dt / 1e9
    print(f"{kind.name} N={n} K={k} tk={tile_k} tn={tile_n}: "
          f"{dt*1e6:8.1f} us  {gbs:6.1f} GB/s  ({nbytes/1e6:.1f} MB)")
    return gbs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="q4_k")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--shape", default="4096x14336",
                    help="NxK (down-proj default)")
    ap.add_argument("--configs", default="7168:512,3584:512,7168:256,2048:512,14336:256")
    args = ap.parse_args()
    setup_jax()
    print("devices:", jax.devices())
    kind = KINDS[args.kind]
    n, k = (int(v) for v in args.shape.split("x"))
    for cfg in args.configs.split(","):
        tk, tn = (int(v) for v in cfg.split(":"))
        if k % tk:
            print(f"skip tk={tk} (K%tk != 0)")
            continue
        try:
            bench(kind, n, k, tk, tn, args.steps)
        except Exception as e:  # noqa: BLE001 — sweep survives OOM configs
            print(f"tk={tk} tn={tn}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
