"""LoRA fine-tuning through the inference stack.

Capability mirror of reference ggml-opt (ggml/src/ggml-opt.cpp: graph-level
AdamW over a dataset) re-expressed the JAX way: the same forward() used for
serving is differentiated with jax.grad; only the LoRA A/B leaves train
(the packed base weights stay frozen/quantized), optax provides AdamW.
The result saves as a reference-format LoRA adapter GGUF, loadable by
runtime/adapter.py and llama.cpp alike.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger(__name__)

_DEFAULT_TARGETS = ("attn_q", "attn_v")


def init_lora(model, rank: int = 8, targets=_DEFAULT_TARGETS, seed: int = 0):
    """Zero-init B, gaussian A (standard LoRA init) for each target weight."""
    rng = np.random.default_rng(seed)
    cfg = model.cfg
    trainable = []
    for il, layer in enumerate(model.params["layers"]):
        for t in targets:
            w = layer.get(t)
            if w is None:
                continue
            n, k = (w.shape if hasattr(w, "shape") else np.asarray(w).shape)[:2]
            a = (rng.standard_normal((rank, k)) * 0.01).astype(np.float32)
            b = np.zeros((n, rank), np.float32)
            trainable.append((il, t, a, b))
    return trainable


def train_lora(model, token_seqs, *, rank: int = 8, steps: int = 50,
               lr: float = 1e-3, alpha: float = 16.0,
               targets=_DEFAULT_TARGETS, seed: int = 0,
               compute_dtype=None, progress=True):
    """AdamW LoRA training on next-token cross-entropy. Returns
    (lora_tree, losses). token_seqs: list of equal-length token lists."""
    import jax
    import jax.numpy as jnp
    import optax

    compute_dtype = compute_dtype or jnp.float32
    from ..models.llama import forward

    cfg = model.cfg
    base = jax.tree.map(jnp.asarray, model.params)
    init = init_lora(model, rank, targets, seed)
    scale = alpha / rank
    lora0 = {f"{il}:{t}": {"a": jnp.asarray(a), "b": jnp.asarray(b)}
             for il, t, a, b in init}

    toks = jnp.asarray(np.asarray(token_seqs, np.int32))
    b_, t_ = toks.shape
    positions = jnp.broadcast_to(jnp.arange(t_), (b_, t_)).astype(jnp.int32)
    mask = jnp.tril(jnp.ones((b_, t_, t_), bool))

    def apply(params, lora):
        layers = [dict(layer) for layer in params["layers"]]
        for key, ab in lora.items():
            il, t = key.split(":")
            layers[int(il)][t + "_lora_a"] = ab["a"]
            layers[int(il)][t + "_lora_b"] = ab["b"] * scale
        return {**params, "layers": layers}

    def loss_fn(lora):
        logits, _ = forward(apply(base, lora), cfg, toks[:, :-1],
                            positions[:, :-1], mask=mask[:, :-1, :-1],
                            compute_dtype=compute_dtype)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1).mean()
        return nll

    opt = optax.adamw(lr)
    state = opt.init(lora0)

    @jax.jit
    def step_fn(lora, state):
        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, state = opt.update(grads, state, lora)
        return optax.apply_updates(lora, updates), state, loss

    lora = lora0
    losses = []
    for i in range(steps):
        lora, state, loss = step_fn(lora, state)
        losses.append(float(loss))
        if progress and (i % 10 == 0 or i == steps - 1):
            log.info("step %d: loss %.4f", i, losses[-1])
    return lora, losses


def save_lora(path: str, lora, model, *, alpha: float = 16.0) -> None:
    """Write a reference-format LoRA adapter GGUF (runtime/adapter.py and
    llama.cpp both load it)."""
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(path, model.cfg.arch)
    w.add_string("general.type", "adapter")
    w.add_string("adapter.type", "lora")
    w.add_float32("adapter.lora.alpha", alpha)
    for key, ab in lora.items():
        il, t = key.split(":")
        w.add_tensor(f"blk.{il}.{t}.weight.lora_a",
                     np.asarray(ab["a"], np.float32))
        w.add_tensor(f"blk.{il}.{t}.weight.lora_b",
                     np.asarray(ab["b"], np.float32))
    w.write()
