"""llava-cli equivalent: multimodal image + text generation
(reference examples/llava/llava-cli.cpp).

The CLIP vision tower + mm projector come from a separate --mmproj GGUF
(models/clip.py); projected patch embeddings are spliced into the decoder
context via LlamaContext.eval_embd at each `<image>` marker in the prompt
(reference llava_eval_image_embed, examples/llava/llava.cpp).

Usage: python -m llama_cpp_dsp_tpu.tools.llava -m model.gguf
           --mmproj mmproj.gguf --image a.png [-p "USER: <image>\\n...  "]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

DEFAULT_PROMPT = "describe the image in detail."


def load_image(path: str) -> np.ndarray:
    """→ uint8 [H, W, 3]. PNG/JPEG via Pillow; .npy arrays pass through."""
    if path.endswith(".npy"):
        arr = np.load(path)
        return np.asarray(arr, np.uint8)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--mmproj", required=True, help="CLIP+projector GGUF")
    ap.add_argument("--image", action="append", required=True,
                    help="image file (repeatable; fills successive <image> "
                         "markers)")
    ap.add_argument("-p", "--prompt", default=DEFAULT_PROMPT)
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.1)
    ap.add_argument("-s", "--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..models.clip import embed_image, load_mmproj
    from ..runtime.context import LlamaContext
    from ..runtime.loader import load_model
    from ..runtime.sampling import make_chain
    from ..utils.jax_setup import setup_jax

    setup_jax()
    for path in [args.model, args.mmproj] + args.image:
        if not os.path.exists(path):
            print(f"error: file not found: {path}", file=sys.stderr)
            return 1

    model = load_model(args.model)
    clip_cfg, clip_params = load_mmproj(args.mmproj)
    ctx = LlamaContext(model, n_ctx=args.ctx_size)
    tok = model.tokenizer

    # reference llava-cli: no <image> marker → conversation wrapper with the
    # image first (llava-cli.cpp process_prompt)
    prompt = args.prompt
    if "<image>" not in prompt:
        prompt = ("A chat between a curious human and an artificial "
                  "intelligence assistant. The assistant gives helpful, "
                  "detailed, and polite answers to the human's questions.\n"
                  f"USER:<image>\n{prompt}\nASSISTANT:")
    segments = prompt.split("<image>")
    if len(segments) - 1 != len(args.image):
        print(f"error: {len(segments) - 1} <image> markers but "
              f"{len(args.image)} --image args", file=sys.stderr)
        return 1

    logits = None
    for i, seg in enumerate(segments):
        if i > 0:
            embd = embed_image(clip_params, clip_cfg, load_image(args.image[i - 1]))
            print(f"image {i}: {embd.shape[0]} patch embeddings",
                  file=sys.stderr)
            logits = ctx.eval_embd(embd)
        if seg:
            ids = tok.encode(seg, add_special=(i == 0), parse_special=True)
            if ids:
                logits = ctx.eval_tokens(ids)
    if logits is None:
        print("error: empty prompt", file=sys.stderr)
        return 1

    sampler = make_chain(temp=args.temp, seed=args.seed)
    for _ in range(args.n_predict):
        t = sampler.sample(logits)
        if model.vocab is not None and model.vocab.is_eog(t):
            break
        sys.stdout.write(tok.token_to_piece(t, special=False)
                         .decode("utf-8", errors="replace"))
        sys.stdout.flush()
        logits = ctx.eval_tokens([t])
    sys.stdout.write("\n")
    print(ctx.perf.report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
