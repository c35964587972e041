"""(dev tool) Audit the single-step decode program for big copy/fusion ops.
Compiles for the REAL TPU (axon) but only inspects HLO — no execution."""
import sys, functools
import sys as _s; _s.path.insert(0, ".")
from llama_cpp_dsp_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
from llama_cpp_dsp_tpu.tools.synth import CONFIGS, synth_params
from llama_cpp_dsp_tpu.runtime.context import convert_params_to_kernel

cfg = CONFIGS["llama3-8b"]
params = synth_params(cfg, GGMLType.Q4_K, seed=0, tie=False)
params = convert_params_to_kernel(params)
params = jax.tree.map(jnp.asarray, params)
cache = KVCache.create(cfg.n_layers, 1, 1024, cfg.n_kv_heads, cfg.head_dim)

@functools.partial(jax.jit, donate_argnums=(1,))
def decode_step(params, cache, tokens, positions, n_past):
    mask = causal_mask(positions, cache.capacity, n_past)
    logits, cache = forward(params, cfg, tokens, positions, cache, n_past,
                            mask, flash=True)
    return logits, cache

tokens = jnp.zeros((1, 1), jnp.int32)
positions = jnp.zeros((1, 1), jnp.int32)
lowered = decode_step.lower(params, cache, tokens, positions, jnp.int32(4))
compiled = lowered.compile()
print(compiled.memory_analysis(), file=sys.stderr)
txt = compiled.as_text()
import re
# find copy ops and their shapes
copies = {}
for m in re.finditer(r'copy[^=]*=\s*(\S+?)\s+copy\(', txt):
    shape = m.group(1)
    copies[shape] = copies.get(shape, 0) + 1
for s, c in sorted(copies.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{c:4d}x copy {s}")
# count total copy bytes
def shape_bytes(s):
    m = re.match(r'(\w+)\[([\d,]*)\]', s)
    if not m: return 0
    dt, dims = m.groups()
    sz = {'f32':4,'bf16':2,'f16':2,'u8':1,'s8':1,'s32':4,'u32':4,'pred':1,'s16':2,'u16':2}.get(dt, 4)
    n = 1
    for d in dims.split(','):
        if d: n *= int(d)
    return n * sz
tot = sum(shape_bytes(s)*c for s, c in copies.items())
print(f"total copy bytes per step: {tot/1e6:.1f} MB")
