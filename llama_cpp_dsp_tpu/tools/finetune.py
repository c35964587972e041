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


def main(argv=None) -> int:
    """CLI (reference examples/finetune): LoRA-train on a text file and
    save a reference-format adapter GGUF."""
    import argparse
    import sys

    ap = argparse.ArgumentParser(
        description="LoRA fine-tuning on next-token cross-entropy")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="training text file")
    ap.add_argument("-o", "--lora-out", required=True,
                    help="output adapter GGUF")
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--alpha", type=float, default=16.0)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--targets", default="attn_q,attn_v",
                    help="comma-separated weight names to adapt")
    ap.add_argument("-s", "--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..runtime.loader import load_model
    from ..utils.jax_setup import setup_jax

    setup_jax()
    model = load_model(args.model)
    ids = model.tokenizer.encode(open(args.file, encoding="utf-8").read())
    sl = args.seq_len
    seqs = [ids[i: i + sl] for i in range(0, len(ids) - sl + 1, sl)]
    if not seqs:
        print(f"error: need at least {sl} tokens, got {len(ids)}",
              file=sys.stderr)
        return 1
    print(f"training rank-{args.rank} LoRA on {len(seqs)} × {sl}-token "
          f"sequences for {args.steps} steps", file=sys.stderr)
    lora, losses = train_lora(
        model, seqs, rank=args.rank, steps=args.steps, lr=args.lr,
        alpha=args.alpha, targets=tuple(args.targets.split(",")),
        seed=args.seed)
    print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f}", file=sys.stderr)
    save_lora(args.lora_out, lora, model, alpha=args.alpha)
    print(f"wrote {args.lora_out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
