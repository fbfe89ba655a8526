"""Fence-strip and light JSON repair for tool/model outputs.

Deterministic port of the reference's structured-output hardening (M14):
``strip_fences`` / ``light_repair`` / ``parse_json_maybe``
(notebooks/04_json_extraction.ipynb:~89; coercion helpers in
notebooks/04a_extraction_hardening.ipynb:~91).  A tool turn that carries
a model-style fenced JSON payload (possibly with leading prose, trailing
commas) is recovered into a dict; anything unrecoverable returns None —
callers treat that as "no structured contribution", never an error.
"""

from __future__ import annotations

import json
import re

_FENCE_RX = re.compile(r"```(?:json)?\s*(.*?)```", re.DOTALL)
_TRAILING_COMMA_RX = re.compile(r",(\s*[}\]])")


def strip_fences(text: str) -> str:
    """The content of the first ``` fence, else the text unchanged."""
    m = _FENCE_RX.search(text)
    return m.group(1) if m else text


def light_repair(s: str) -> str:
    """Cheap deterministic repairs: drop everything before the first
    '{'/'[' (leading prose) and remove trailing commas before a closing
    brace/bracket."""
    start = min((i for i in (s.find("{"), s.find("[")) if i >= 0),
                default=0)
    return _TRAILING_COMMA_RX.sub(r"\1", s[start:])


def parse_json_maybe(text: str):
    """dict/list or None — tries raw, then fence-stripped, then repaired."""
    for candidate in (text, strip_fences(text),
                      light_repair(strip_fences(text))):
        try:
            return json.loads(candidate)
        except (json.JSONDecodeError, TypeError):
            continue
    return None
