"""Generate markdown documentation for the CLI and server flags.

Role of the reference's gen-docs example (examples/gen-docs/gen-docs.cpp):
walk every registered argument of each front-end parser and emit a
markdown table (flag, env var, default, help), so docs never drift from
the code.

Usage: python -m llama_cpp_dsp_tpu.tools.gen_docs [-o DIR]
"""

from __future__ import annotations

import argparse
import sys


def _parser_table(ap: argparse.ArgumentParser, env_prefix: str = "LLAMA_ARG_") -> str:
    rows = ["| Argument | Env | Default | Explanation |",
            "| --- | --- | --- | --- |"]
    for action in ap._actions:
        if isinstance(action, argparse._HelpAction):
            continue
        flags = ", ".join(f"`{o}`" for o in action.option_strings) or (
            f"`{action.dest}`")
        env = f"`{env_prefix}{action.dest.upper()}`" if action.option_strings else ""
        default = "" if action.default in (None, argparse.SUPPRESS) else (
            f"`{action.default}`")
        help_txt = (action.help or "").replace("|", "\\|")
        rows.append(f"| {flags} | {env} | {default} | {help_txt} |")
    return "\n".join(rows)


def _cli_parser() -> argparse.ArgumentParser:
    from .cli import build_arg_parser

    return build_arg_parser()


def _server_parser() -> argparse.ArgumentParser:
    from ..serve.server import build_arg_parser

    return build_arg_parser()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--output", default=None,
                    help="directory to write cli.md/server.md (default: stdout)")
    args = ap.parse_args(argv)

    sections = []
    for title, getter in (("llama-cli", _cli_parser),
                          ("llama-server", _server_parser)):
        try:
            table = _parser_table(getter())
        except Exception as e:  # front-end without a build_parser hook
            table = f"_(unavailable: {e})_"
        sections.append((title, f"# {title}\n\n{table}\n"))

    if args.output:
        import pathlib

        out = pathlib.Path(args.output)
        out.mkdir(parents=True, exist_ok=True)
        for title, text in sections:
            (out / f"{title.replace('llama-', '')}.md").write_text(text)
            print(f"wrote {out / (title.replace('llama-', '') + '.md')}",
                  file=sys.stderr)
    else:
        for _, text in sections:
            print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
