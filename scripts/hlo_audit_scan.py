"""(dev tool) Audit the decode_scan (fori_loop) program — the bench's
actual timed program — for copies and temp allocation."""
import sys, functools, re
sys.path.insert(0, ".")
from llama_cpp_dsp_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
from llama_cpp_dsp_tpu.tools.synth import CONFIGS, synth_params
from llama_cpp_dsp_tpu.runtime.context import convert_params_to_kernel

model = sys.argv[1] if len(sys.argv) > 1 else "llama3-8b"
qt = GGMLType[(sys.argv[2] if len(sys.argv) > 2 else "q4_k").upper()]
n_ctx = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
cfg = CONFIGS[model]
params = synth_params(cfg, qt, seed=0, tie=False)
params = convert_params_to_kernel(params)
params = jax.tree.map(jnp.asarray, params)
cache = KVCache.create(cfg.n_layers, 1, n_ctx, cfg.n_kv_heads, cfg.head_dim)

@functools.partial(jax.jit, static_argnames=("steps",), donate_argnums=(1,))
def decode_scan(params, cache, tokens, n_past0, steps):
    def body(i, carry):
        cache, toks, n_past = carry
        positions = jnp.broadcast_to(n_past[None, None], toks.shape).astype(jnp.int32)
        mask = causal_mask(positions, cache.capacity, n_past)
        logits, cache = forward(params, cfg, toks, positions, cache, n_past,
                                mask, flash=True)
        nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        return cache, nxt, n_past + 1
    cache, toks, _ = jax.lax.fori_loop(0, steps, body, (cache, tokens, n_past0))
    return cache, toks

tokens = jnp.zeros((1, 1), jnp.int32)
lowered = decode_scan.lower(params, cache, tokens, jnp.int32(0), 8)
compiled = lowered.compile()
print(compiled.memory_analysis(), file=sys.stderr)
txt = compiled.as_text()
copies = {}
for m in re.finditer(r'copy[^=]*=\s*(\S+?)\s+copy\(', txt):
    copies[m.group(1)] = copies.get(m.group(1), 0) + 1
def shape_bytes(s):
    m = re.match(r'(\w+)\[([\d,]*)\]', s)
    if not m: return 0
    dt, dims = m.groups()
    sz = {'f32':4,'bf16':2,'f16':2,'u8':1,'s8':1,'s32':4,'u32':4,'pred':1}.get(dt, 4)
    n = 1
    for d in dims.split(','):
        if d: n *= int(d)
    return n*sz
for s, c in sorted(copies.items(), key=lambda kv: -shape_bytes(kv[0])*kv[1])[:20]:
    print(f"{c:4d}x copy {s} ({shape_bytes(s)*c/1e6:.2f} MB)")
tot = sum(shape_bytes(s)*c for s, c in copies.items())
print(f"total copy bytes in program (8 steps): {tot/1e6:.1f} MB")
# fusion count ~ op count proxy
print("fusions:", len(re.findall(r'= \S+ fusion\(', txt)),
      "custom-calls:", len(re.findall(r'custom_call_target="tpu_custom_call"', txt)),
      "while:", len(re.findall(r'= \S+ while\(', txt)))
