"""Argument env-var fallback.

Mirror of the reference arg system's env bindings (common/arg.cpp:72-81:
70 LLAMA_ARG_* variables, precedence CLI > env > default): any option not
given on the command line picks up LLAMA_ARG_<DEST_UPPERCASE> from the
environment.
"""

from __future__ import annotations

import argparse
import os


def parse_with_env(ap: argparse.ArgumentParser, argv=None,
                   prefix: str = "LLAMA_ARG_") -> argparse.Namespace:
    args = ap.parse_args(argv)
    given: set[str] = set()
    # rebuild which dests were explicitly provided
    sentinel = ap.parse_args(argv, namespace=argparse.Namespace())
    for action in ap._actions:
        env_key = prefix + action.dest.upper()
        raw = os.environ.get(env_key)
        if raw is None:
            continue
        # CLI wins: only apply env when the current value equals the default
        if getattr(args, action.dest, None) != action.default:
            continue
        if isinstance(action, (argparse._StoreTrueAction,)):
            val: object = raw.lower() in ("1", "true", "yes", "on")
        elif action.type is not None:
            val = action.type(raw)
        else:
            val = raw
        setattr(args, action.dest, val)
    return args
