"""Full-parameter fine-tuning of a loaded GGUF model.

Reference role: ggml-opt driving a full llama graph (every weight gets an
AdamW step — ggml/src/ggml-opt.cpp:447 attaches opt_step_adamw to each
trainable node). Here: packed QTensor weights are dequantized once into an
f32 master tree (quant/jax_dequant dequant — bit-identical to the reference
dequantize_row_*), the serving forward() is differentiated with jax.grad
over the WHOLE tree, and the result is written back to GGUF (requantized to
the source tensor types, or an explicit override) so both this framework
and llama.cpp can load the fine-tuned model.
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

from ..gguf.constants import GGMLType
from ..ops.qtensor import QTensor

log = logging.getLogger(__name__)


def dequantize_tree(params) -> Any:
    """QTensor leaves -> dense f32 jax arrays (trainable master weights);
    dense leaves pass through as f32."""
    import jax.numpy as jnp

    from ..quant.jax_dequant import dequant

    def conv(leaf):
        if isinstance(leaf, QTensor):
            if leaf.n_expert:
                per = [dequant(QTensor(leaf.kind, leaf.shape,
                                       {k: a[e] for k, a in leaf.arrays.items()}))
                       for e in range(leaf.n_expert)]
                return jnp.stack(per)
            return dequant(leaf)
        if leaf is None:
            return None
        return jnp.asarray(leaf, jnp.float32) if jnp.asarray(leaf).dtype in (
            jnp.float16, jnp.bfloat16, jnp.float32) else jnp.asarray(leaf)

    return _tree_map_leaves(params, conv)


def _tree_map_leaves(tree, fn):
    if isinstance(tree, dict):
        return {k: _tree_map_leaves(v, fn) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_map_leaves(v, fn) for v in tree]
    return fn(tree)


def train_full(model, token_seqs, *, steps: int = 50, lr: float = 1e-4,
               wd: float = 0.0, compute_dtype=None, progress=True,
               seed: int = 0):
    """AdamW over every parameter, next-token cross-entropy.

    token_seqs: list of equal-length token-id lists. Returns
    (trained f32 tree, losses). Mirrors tools/finetune.train_lora but with
    the full tree trainable (ggml-opt full-graph mode).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.llama import forward

    compute_dtype = compute_dtype or jnp.float32
    cfg = model.cfg
    params = dequantize_tree(model.params)

    toks = jnp.asarray(np.asarray(token_seqs, np.int32))
    b_, t_ = toks.shape
    positions = jnp.broadcast_to(jnp.arange(t_), (b_, t_)).astype(jnp.int32)
    mask = jnp.tril(jnp.ones((b_, t_, t_), bool))

    def loss_fn(p):
        logits, _ = forward(p, cfg, toks[:, :-1], positions[:, :-1],
                            mask=mask[:, :-1, :-1], compute_dtype=compute_dtype)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = toks[:, 1:]
        return -jnp.take_along_axis(logp, tgt[..., None], axis=-1).mean()

    opt = optax.adamw(lr, weight_decay=wd)
    state = opt.init(params)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(steps):
        params, state, loss = step_fn(params, state)
        losses.append(float(loss))
        if progress and (i % 10 == 0 or i == steps - 1):
            log.info("step %d: loss %.4f", i, losses[-1])
    return params, losses


# --- save back to GGUF ------------------------------------------------------

def _inverse_maps():
    """gguf tensor name -> param-tree key, from the loader's forward maps
    (first mapping wins — later entries are arch aliases)."""
    from ..runtime import loader as L

    inv_layer, inv_global = {}, {}
    seen = set()
    for gname, key in L._LAYER_TENSORS.items():
        if key not in seen:
            inv_layer[gname] = key
            seen.add(key)
        else:
            inv_layer.setdefault(gname, key)
    for gname, key in L._GLOBAL_TENSORS.items():
        inv_global.setdefault(gname, key)
    return inv_layer, inv_global


def _lookup(trained, name: str, cfg):
    """Trained value for a source-GGUF tensor name (None = keep source)."""
    inv_layer, inv_global = _inverse_maps()
    if name.startswith("blk."):
        _, il, rest = name.split(".", 2)
        layer = trained["layers"][int(il)]
        key = inv_layer.get(rest)
        if key is None:
            return None
        if key == "attn_qkv":  # loader split fused qkv; re-concat on save
            import jax.numpy as jnp

            return jnp.concatenate(
                [layer["attn_q"], layer["attn_k"], layer["attn_v"]], axis=0)
        if key == "attn_qkv_bias":
            import jax.numpy as jnp

            return jnp.concatenate(
                [layer["attn_q_bias"], layer["attn_k_bias"],
                 layer["attn_v_bias"]], axis=0)
        return layer.get(key)
    key = inv_global.get(name)
    return None if key is None else trained.get(key)


def save_full(dst: str, src: str, model, trained, *,
              out_type: GGMLType | None = None) -> int:
    """Write the fine-tuned model as GGUF: source file's KV metadata and
    tensor set, each weight replaced by its trained value requantized to the
    source tensor's type (or `out_type` for all ≥2-D weights). Returns the
    number of tensors replaced."""
    from ..gguf.constants import Keys
    from ..gguf.reader import GGUFModel
    from ..gguf.writer import GGUFWriter
    from ..quant import ref_numpy as refq

    gm = GGUFModel.load(src)
    w = GGUFWriter(dst, gm.kv.get(Keys.General.ARCHITECTURE, "llama"))
    kv_types = gm.kv_types
    for key, val in gm.kv.items():
        if key != Keys.General.ARCHITECTURE:
            # re-emit with the source's recorded types: llama.cpp's readers
            # type-check scalar keys (UINT32 context_length must not come
            # back as inferred INT32)
            vtype, etype = kv_types.get(key, (None, None))
            w.add_kv(key, val, vtype, etype)
    replaced = 0
    for name, info in gm.tensors.items():
        val = _lookup(trained, name, model.cfg)
        if val is None:
            w.add_tensor(name, np.asarray(info.data), ggml_type=info.ggml_type,
                         ne_shape=info.shape)
            continue
        f32 = np.asarray(val, np.float32)
        if tuple(reversed(info.shape)) != f32.shape and name.endswith("ffn_up.weight"):
            # source kept gate+up fused (loader._split_fused split it)
            _, il, _ = name.split(".", 2)
            gate = np.asarray(trained["layers"][int(il)]["ffn_gate"], np.float32)
            f32 = np.concatenate([gate, f32], axis=0)
        if tuple(reversed(info.shape)) != f32.shape:
            raise ValueError(
                f"trained {name} shape {f32.shape} != source "
                f"{tuple(reversed(info.shape))} — refusing to write")
        t = info.ggml_type
        if out_type is not None and f32.ndim >= 2:
            t = out_type
        if t == GGMLType.F32:
            w.add_tensor(name, f32)
        else:
            raw = refq.quantize(f32.reshape(-1), t)
            w.add_tensor(name, raw, ggml_type=t,
                         ne_shape=tuple(reversed(f32.shape)))
        replaced += 1
    w.write()
    gm.close()
    return replaced
