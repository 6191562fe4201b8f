"""Parser backend registry — the engine-side analog of the reference's
parser plugin ABC (/root/reference/textcrafts/parser_api.py:5-30, realized
twice there as corenlp_api.py and stanfordnlp_api.py).

A backend is any module exposing `parse_turn(text) -> ParsedSentence` and
`parse_sentence(sent) -> ParsedSentence`. Backends are resolved BY NAME so
the Spark Arrow workers import the module themselves instead of unpickling
a function closure, and so config (CraftParams.parser_backend / the
DEEPRANK_PARSER_BACKEND env var) stays a plain string.
"""

from __future__ import annotations

import os

DEFAULT_BACKEND = "simple"

_MODULES = {
    "simple": "deeprank_spark.nlp.simple_parser",
    "window": "deeprank_spark.nlp.window_parser",
}


def resolve(name: str | None = None):
    """-> backend module for `name` (None = env override or 'simple')."""
    import importlib

    name = name or os.environ.get("DEEPRANK_PARSER_BACKEND") or DEFAULT_BACKEND
    if name not in _MODULES:
        raise ValueError(f"unknown parser backend {name!r}; have {sorted(_MODULES)}")
    return importlib.import_module(_MODULES[name])


def get_parse_turn(name: str | None = None):
    return resolve(name).parse_turn


def get_parse_sentence(name: str | None = None):
    return resolve(name).parse_sentence
