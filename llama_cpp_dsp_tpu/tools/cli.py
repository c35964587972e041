"""llama-cli equivalent: one-shot / interactive generation.

Mirrors the behavior of reference examples/main/main.cpp (prompt handling,
sampling flags, perf report). Usage:
    python -m llama_cpp_dsp_tpu.tools.cli -m model.gguf -p "prompt" -n 64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from ..runtime.context import LlamaContext
from ..runtime.loader import load_model
from ..runtime.sampling import make_chain


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="llama-cli", description=__doc__)
    p.add_argument("-m", "--model", required=True, help="GGUF model path")
    p.add_argument("-p", "--prompt", default="", help="prompt text")
    p.add_argument("-f", "--file", default=None,
                   help="read the prompt from a file (reference -f)")
    p.add_argument("-e", "--escape", action="store_true",
                   help=r"process \n, \t, \x.. escapes in prompt/prefix/"
                        "suffix/reverse-prompt (reference -e)")
    p.add_argument("-r", "--reverse-prompt", action="append", default=[],
                   help="stop generation at this string (repeatable; "
                        "reference -r)")
    p.add_argument("--in-prefix", default="",
                   help="prefix prepended to interactive user input")
    p.add_argument("--in-suffix", default="",
                   help="suffix appended to interactive user input")
    p.add_argument("-n", "--n-predict", type=int, default=128)
    p.add_argument("-c", "--ctx-size", type=int, default=2048)
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("--temp", type=float, default=0.8)
    p.add_argument("--top-k", type=int, default=40)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--min-p", type=float, default=0.05)
    p.add_argument("--repeat-penalty", type=float, default=1.0)
    p.add_argument("--repeat-last-n", type=int, default=64)
    p.add_argument("--typical", type=float, default=1.0)
    p.add_argument("--xtc-probability", type=float, default=0.0)
    p.add_argument("--xtc-threshold", type=float, default=0.1)
    p.add_argument("--top-nsigma", type=float, default=-1.0)
    p.add_argument("--frequency-penalty", type=float, default=0.0)
    p.add_argument("--presence-penalty", type=float, default=0.0)
    p.add_argument("--dry-multiplier", type=float, default=0.0)
    p.add_argument("--mirostat", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--mirostat-ent", type=float, default=5.0)
    p.add_argument("--mirostat-lr", type=float, default=0.1)
    p.add_argument("--dynatemp-range", type=float, default=0.0)
    p.add_argument("--dynatemp-exp", type=float, default=1.0)
    p.add_argument("-l", "--logit-bias", action="append", default=[],
                   metavar="TOKEN(+/-)BIAS", help="e.g. 15043+1 or 15043-inf")
    p.add_argument("--no-display-prompt", action="store_true")
    p.add_argument("-i", "--interactive", action="store_true")
    p.add_argument("-cnv", "--conversation", action="store_true",
                   help="chat-template conversation mode (reference -cnv)")
    p.add_argument("--chat-template", default=None,
                   help="builtin template name (chatml, llama3, ...) or "
                        "jinja text overriding the model's template")
    p.add_argument("-sys", "--system-prompt", default=None)
    p.add_argument("--compute-dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("-fa", "--flash-attn", dest="flash_attn", default=None,
                   action="store_true",
                   help="force fused kernels on (reference -fa; default "
                        "auto: on for TPU, off elsewhere)")
    p.add_argument("--no-flash-attn", dest="flash_attn", action="store_false")
    p.add_argument("--grammar", default=None,
                   help="GBNF grammar string constraining generation")
    p.add_argument("--grammar-file", default=None)
    p.add_argument("-j", "--json-schema", default=None,
                   help="JSON schema; converted to GBNF (reference -j)")
    p.add_argument("--prompt-cache", metavar="FILE",
                   help="load/save prompt KV state (reference --prompt-cache)")
    p.add_argument("--keep", type=int, default=0,
                   help="tokens to keep on context-shift (reference --keep)")
    p.add_argument("--no-context-shift", action="store_true")
    p.add_argument("-gan", "--grp-attn-n", type=int, default=1,
                   help="self-extend group factor (reference --grp-attn-n)")
    p.add_argument("-gaw", "--grp-attn-w", type=int, default=512,
                   help="self-extend window (reference --grp-attn-w)")
    p.add_argument("-ctk", "--cache-type-k", default="bf16",
                   choices=["f32", "f16", "bf16", "q8_0", "q4_0", "q4_1", "q5_0", "q5_1", "iq4_nl"],
                   help="K cache data type (reference --cache-type-k)")
    p.add_argument("-ctv", "--cache-type-v", default=None,
                   choices=["f32", "f16", "bf16", "q8_0", "q4_0", "q4_1", "q5_0", "q5_1", "iq4_nl"],
                   help="V cache data type (reference --cache-type-v; "
                        "defaults to -ctk; mixed pairs run the XLA "
                        "attention path)")
    p.add_argument("--lora", action="append", default=[],
                   help="LoRA adapter GGUF (repeatable, scale 1.0)")
    p.add_argument("--lora-scaled", nargs=2, action="append", default=[],
                   metavar=("PATH", "SCALE"))
    p.add_argument("--control-vector", action="append", default=[],
                   help="control-vector GGUF (reference --control-vector)")
    p.add_argument("--control-vector-scaled", nargs=2, action="append",
                   default=[], metavar=("PATH", "SCALE"))
    p.add_argument("-tp", "--tensor-parallel", type=int, default=1,
                   help="shard weights/KV over N chips (TPU-native "
                        "split-mode ROW; XLA/GSPMD inserts the collectives)")
    p.add_argument("--device", default=None,
                   help="JAX platform to run on, e.g. cpu / tpu (reference "
                        "--device; default: best available)")
    p.add_argument("-md", "--model-draft", default=None,
                   help="draft model GGUF for speculative decoding "
                        "(reference -md, examples/speculative)")
    p.add_argument("--draft-max", type=int, default=16,
                   help="max tokens drafted per round (reference --draft-max)")
    p.add_argument("--draft-min", type=int, default=0)
    p.add_argument("--draft-p-min", type=float, default=0.75,
                   help="stop drafting below this confidence")
    return p


def _process_escapes(s: str) -> str:
    r"""\n \t \r \' \" \\ \xHH escapes (reference common
    string_process_escapes) without unicode_escape's latin-1 mangling."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            simple = {"n": "\n", "t": "\t", "r": "\r", "b": "\b",
                      "'": "'", '"': '"', "\\": "\\"}
            if n in simple:
                out.append(simple[n])
                i += 2
                continue
            if n == "x" and i + 3 < len(s) + 1:
                try:
                    out.append(chr(int(s[i + 2 : i + 4], 16)))
                    i += 4
                    continue
                except ValueError:
                    pass
        out.append(c)
        i += 1
    return "".join(out)


def main(argv=None) -> int:
    from ..utils.args import parse_with_env

    args = parse_with_env(build_arg_parser(), argv)
    if args.file:
        with open(args.file, encoding="utf-8") as fh:
            args.prompt = fh.read().rstrip("\n")
    if args.escape:
        args.prompt = _process_escapes(args.prompt)
        args.in_prefix = _process_escapes(args.in_prefix)
        args.in_suffix = _process_escapes(args.in_suffix)
        args.reverse_prompt = [_process_escapes(r)
                               for r in args.reverse_prompt]
    from ..utils.jax_setup import setup_jax

    setup_jax(platform=args.device)
    import jax.numpy as jnp

    if not os.path.exists(args.model):
        print(f"error: model file not found: {args.model}", file=sys.stderr)
        return 1
    t0 = time.perf_counter()
    try:
        model = load_model(args.model)
    except Exception as e:
        print(f"error: failed to load model: {e}", file=sys.stderr)
        return 1
    print(f"loaded {args.model} ({model.cfg.arch}, {model.cfg.n_layers} layers, "
          f"{model.n_bytes / 1e9:.2f} GB) in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    loras = [(p, 1.0) for p in args.lora] + [(p, float(s))
                                             for p, s in args.lora_scaled]
    cvecs = [(p, 1.0) for p in args.control_vector] + [
        (p, float(s)) for p, s in args.control_vector_scaled]
    if loras or cvecs:
        from ..runtime.adapter import (
            apply_control_vector, apply_lora, load_control_vector, load_lora,
        )

        for path, scale in loras:
            model.params = apply_lora(model.params, load_lora(path), scale)
        for path, scale in cvecs:
            dirs = load_control_vector(path, model.cfg.n_layers)
            model.params = apply_control_vector(model.params, dirs, scale=scale)
    ctx = LlamaContext(
        model,
        n_ctx=args.ctx_size,
        compute_dtype=jnp.float32 if args.compute_dtype == "float32" else jnp.bfloat16,
        kv_dtype=args.cache_type_k,
        kv_v_dtype=args.cache_type_v,
        use_pallas=args.flash_attn,
        tp=args.tensor_parallel,
    )
    spec = None
    if args.model_draft:
        from ..runtime.speculative import SpecParams, SpeculativeDecoder

        try:
            draft_model = load_model(args.model_draft)
        except Exception as e:
            print(f"error: failed to load draft model: {e}", file=sys.stderr)
            return 1
        draft_ctx = LlamaContext(
            draft_model, n_ctx=args.ctx_size, kv_dtype=args.cache_type_k,
            use_pallas=args.flash_attn,
        )
        spec = SpeculativeDecoder(ctx, draft_ctx, SpecParams(
            n_draft=args.draft_max, n_min=args.draft_min,
            p_min=args.draft_p_min))
        print(f"speculative: draft {args.model_draft} "
              f"(n_draft={args.draft_max}, p_min={args.draft_p_min})",
              file=sys.stderr)

    grammar_sampler = None
    gtext = args.grammar
    if args.grammar_file:
        gtext = open(args.grammar_file, encoding="utf-8").read()
    if args.json_schema:
        import json as _json

        from ..grammar.json_schema import json_schema_to_gbnf

        gtext = json_schema_to_gbnf(_json.loads(args.json_schema))
    if gtext:
        from ..grammar.gbnf import GrammarSampler, parse_gbnf

        grammar_sampler = GrammarSampler(parse_gbnf(gtext), model.tokenizer)

    logit_bias = {}
    for spec in args.logit_bias:
        # reference format: TOKEN_ID(+|-)BIAS, '-inf' bans the token
        import re as _re

        mm = _re.match(r"^(\d+)([+-].*)$", spec)
        if not mm:
            print(f"warning: bad --logit-bias {spec!r}", file=sys.stderr)
            continue
        val = mm.group(2)
        logit_bias[int(mm.group(1))] = (
            float("-inf") if val in ("-inf",) else float(val))

    sampler = make_chain(
        grammar=grammar_sampler,
        seed=args.seed,
        temp=args.temp,
        dynatemp_range=args.dynatemp_range,
        dynatemp_exponent=args.dynatemp_exp,
        top_k=args.top_k,
        top_p=args.top_p,
        min_p=args.min_p,
        typical_p=args.typical,
        xtc_probability=args.xtc_probability,
        xtc_threshold=args.xtc_threshold,
        top_n_sigma=args.top_nsigma,
        penalty_repeat=args.repeat_penalty,
        penalty_last_n=args.repeat_last_n,
        penalty_freq=args.frequency_penalty,
        penalty_present=args.presence_penalty,
        dry_multiplier=args.dry_multiplier,
        mirostat=args.mirostat,
        mirostat_tau=args.mirostat_ent,
        mirostat_eta=args.mirostat_lr,
        logit_bias=logit_bias or None,
    )

    def run_once(prompt: str) -> None:
        import os as _os

        tok = model.tokenizer
        ids = tok.encode(prompt, add_special=True, parse_special=True)
        # prompt cache — reference examples/main prompt-cache reuse: restore
        # the session when the cached token stream is a prefix of this prompt
        cached: list[int] = []
        if args.prompt_cache and _os.path.exists(args.prompt_cache):
            from ..runtime.state_io import load_state

            try:
                cached = load_state(ctx, args.prompt_cache)
            except Exception as e:
                print(f"prompt-cache: ignoring ({e})", file=sys.stderr)
                cached = []
            # longest matching prefix is reusable (reference
            # n_matching_session_tokens, examples/main/main.cpp)
            n_match = 0
            for a, b in zip(cached, ids):
                if a != b:
                    break
                n_match += 1
            if n_match > 1:
                ctx.rollback_to(n_match)
                cached = cached[:n_match]
                print(f"prompt-cache: reusing {n_match} tokens", file=sys.stderr)
            else:
                ctx.reset()
                cached = []
        if len(ids) >= ctx.n_ctx:
            print(
                f"error: prompt is {len(ids)} tokens but context size is {ctx.n_ctx}",
                file=sys.stderr,
            )
            return
        if not args.no_display_prompt:
            sys.stdout.write(prompt)
            sys.stdout.flush()
        if cached:
            remaining = ids[len(cached):] or [ids[-1]]
            if not ids[len(cached):]:
                ctx.rollback_to(ctx.n_past - 1)  # re-eval last token for logits
            ids = remaining
        if args.prompt_cache and not cached:
            full_ids = list(ids)
        gen_ids: list = []
        if spec is not None:
            stream = spec.generate(ids, max_new_tokens=args.n_predict,
                                   sampler=sampler)
        else:
            stream = ctx.generate(ids, max_new_tokens=args.n_predict,
                                  sampler=sampler,
                                  context_shift=not args.no_context_shift,
                                  n_keep=args.keep, ga_n=args.grp_attn_n,
                                  ga_w=args.grp_attn_w)
        # stream raw piece BYTES like the reference's main.cpp — decoding to
        # str with errors="replace" would mangle byte tokens that form valid
        # UTF-8 only once concatenated (and breaks byte-level A/B vs the
        # reference binary)
        stops = [r.encode("utf-8") for r in args.reverse_prompt]
        hold = max((len(r) for r in stops), default=1) - 1
        buf = b""
        sys.stdout.flush()
        out = sys.stdout.buffer
        for t in stream:
            gen_ids.append(t)
            buf += tok.token_to_piece(t, special=False)
            hit = next((r for r in stops if r in buf), None)
            if hit:
                # print up to the reverse prompt, drop it, stop (reference
                # antiprompt check, examples/main/main.cpp)
                out.write(buf[: buf.index(hit)])
                buf = b""
                break
            if len(buf) > hold:  # flush bytes that cannot start a stop match
                cut = len(buf) - hold
                out.write(buf[:cut])
                buf = buf[cut:]
            out.flush()
        out.write(buf + b"\n")
        out.flush()
        if args.prompt_cache and not cached:
            from ..runtime.state_io import save_state

            # session = prompt + generated (reference saves the whole session)
            save_state(ctx, args.prompt_cache, full_ids + gen_ids)
            print(f"prompt-cache: saved {len(full_ids) + len(gen_ids)} tokens",
                  file=sys.stderr)
        print(ctx.perf.report(), file=sys.stderr)
        if spec is not None:
            s = spec.stats
            print(f"speculative: {s.n_draft_accepted}/{s.n_draft_proposed} "
                  f"drafted tokens accepted "
                  f"({s.acceptance_rate * 100:.1f}%) over {s.n_rounds} rounds",
                  file=sys.stderr)

    def run_conversation() -> None:
        """Chat-template multi-turn loop — reference llama-cli -cnv: the
        rendered-so-far prefix is reused via the KV cache (only the new
        turn's suffix is evaluated each round)."""
        from ..serve.chat import apply_chat_template

        tok = model.tokenizer
        template = args.chat_template or model.vocab.chat_template
        messages = []
        if args.system_prompt:
            messages.append({"role": "system", "content": args.system_prompt})
        history: list[int] = []  # token stream currently in the KV cache
        print("conversation mode; empty line to quit", file=sys.stderr)
        while True:
            try:
                line = input("> ")
            except EOFError:
                break
            if not line:
                break
            messages.append({"role": "user", "content": line})
            text = apply_chat_template(template, messages,
                                       add_generation_prompt=True)
            ids = tok.encode(text, add_special=True, parse_special=True)
            if len(ids) + args.n_predict >= ctx.n_ctx:
                # whole-history overflow: drop oldest turns (keep system)
                keep = 1 if args.system_prompt else 0
                while len(messages) > keep + 1 and len(ids) + args.n_predict >= ctx.n_ctx:
                    del messages[keep]
                    text = apply_chat_template(template, messages,
                                               add_generation_prompt=True)
                    ids = tok.encode(text, add_special=True, parse_special=True)
            # longest common prefix with the cached stream is reusable
            common = 0
            for a, b in zip(history, ids):
                if a != b:
                    break
                common += 1
            if common == len(ids):
                common -= 1  # re-eval the last token for fresh logits
            ctx.rollback_to(min(common, ctx.n_past))
            new_ids = ids[common:]
            reply_ids = []
            for t in ctx.generate(new_ids, max_new_tokens=args.n_predict,
                                  sampler=sampler, context_shift=False):
                reply_ids.append(t)
                piece = tok.token_to_piece(t, special=False)
                sys.stdout.write(piece.decode("utf-8", errors="replace"))
                sys.stdout.flush()
            sys.stdout.write("\n")
            history = ids + reply_ids
            messages.append({"role": "assistant", "content": tok.decode(reply_ids)})

    if args.conversation:
        run_conversation()
    elif args.interactive:
        print("interactive mode; empty line to quit", file=sys.stderr)
        while True:
            try:
                line = input("> ")
            except EOFError:
                break
            if not line:
                break
            ctx.reset()
            if spec is not None:
                spec.draft.reset()
            sampler.reset()
            run_once(args.in_prefix + line + args.in_suffix)
    else:
        run_once(args.prompt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
