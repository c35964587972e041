"""Pydantic models → GBNF (reference examples/pydantic_models_to_grammar.py
role): compile one or more pydantic models to a grammar whose root accepts
any of their JSON encodings, via each model's JSON schema."""

from __future__ import annotations

__all__ = ["pydantic_models_to_grammar"]


def pydantic_models_to_grammar(*models) -> str:
    """BaseModel subclasses → GBNF text (root = anyOf over the models)."""
    schemas = [m.model_json_schema() for m in models]
    if len(schemas) == 1:
        schema = schemas[0]
    else:
        defs = {}
        for s in schemas:
            defs.update(s.pop("$defs", {}))
        for s in schemas:
            defs[s["title"]] = s
        schema = {
            "$defs": defs,
            "anyOf": [{"$ref": f"#/$defs/{s['title']}"} for s in schemas],
        }
    from .json_schema import json_schema_to_gbnf

    return json_schema_to_gbnf(schema)
