"""Text-analysis scalar functions: token counts, quality counters,
language-ID heuristic, content fingerprint.

Generalizes the reference's per-page text-quality analyzer
(``analyze_text_quality`` — special-char ratio, repetitive/long tokens,
single-char ratio, quality score; notebooks/01_qa_pipeline_evaluation.ipynb:~117)
and term-harvest metrics (``extract_medical_terms``,
notebooks/qa_pipeline_evaluator.py:322-325) into engine operators over any
document table.

Every function here is deliberately expressible in ANSI SQL (DuckDB) with
IDENTICAL semantics, so the driver's oracle gate can verify the Ray
implementation value-for-value:

- regex character classes are explicit ASCII (RE2 in DuckDB is ASCII-\\w;
  Python's \\w is unicode — so neither side uses \\w),
- counts are integers (no float ratios in gated outputs),
- the language heuristic is a deterministic stopword-hit argmax with a
  lexicographic tie-break.
"""

from __future__ import annotations

import hashlib
import re

_TOKEN_RX = re.compile(r"[A-Za-z0-9_]+")
_ALPHA_RX = re.compile(r"[A-Za-z]+")
_PUNCT_RX = re.compile(r"[.,;:!?]")
_UPPER_RX = re.compile(r"[A-Z]")
_WS_RX = re.compile(r"[ \t\n\r\f\v]+")

EN_STOPS = ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was")
DE_STOPS = ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "und")
FR_STOPS = ("le", "la", "et", "les", "des", "est", "une", "dans", "pour", "que")


def tokens(text: str) -> list[str]:
    return _TOKEN_RX.findall(text)


def token_count(text: str) -> int:
    return len(_TOKEN_RX.findall(text))


def alpha_tokens_lower(text: str) -> list[str]:
    return [t.lower() for t in _ALPHA_RX.findall(text)]


def punct_count(text: str) -> int:
    return len(_PUNCT_RX.findall(text))


def upper_count(text: str) -> int:
    return len(_UPPER_RX.findall(text))


def stop_count(text: str, stops: tuple[str, ...] = EN_STOPS) -> int:
    ss = set(stops)
    return sum(1 for t in alpha_tokens_lower(text) if t in ss)


def normalize_for_fingerprint(text: str) -> str:
    return _WS_RX.sub(" ", text.lower()).strip(" \t\n\r\f\v")


def fingerprint_md5(text: str) -> str:
    """Whitespace/case-insensitive content fingerprint (md5 of normalized
    text) — SQL mirror: md5(trim(regexp_replace(lower(text),'[ \\t\\n\\r\\f\\v]+',' ','g')))."""
    return hashlib.md5(normalize_for_fingerprint(text).encode("utf-8")).hexdigest()


def exact_hash(text: str) -> str:
    """Exact-content hash for exact dedup — SQL mirror: md5(text)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def lang_guess(text: str) -> str:
    """Stopword-hit argmax over {de,en,fr}; all-zero → 'und'; ties break
    lexicographically (de < en < fr).  SQL mirror is a CASE chain with >=
    comparisons in the same order."""
    toks = alpha_tokens_lower(text)
    en = sum(1 for t in toks if t in set(EN_STOPS))
    de = sum(1 for t in toks if t in set(DE_STOPS))
    fr = sum(1 for t in toks if t in set(FR_STOPS))
    if en == 0 and de == 0 and fr == 0:
        return "und"
    if de >= en and de >= fr:
        return "de"
    if en >= fr:
        return "en"
    return "fr"


def quality_counts(text: str) -> dict[str, int]:
    """Integer quality counters (the reference's ratio heuristics, kept as
    exact counts so the SQL oracle matches bit-for-bit)."""
    toks = _TOKEN_RX.findall(text)
    return {
        "n_chars": len(text),
        "n_tokens": len(toks),
        "n_punct": punct_count(text),
        "n_upper": upper_count(text),
        "n_stop": stop_count(text),
        "n_long_tokens": sum(1 for t in toks if len(t) > 20),
        "n_single_char_tokens": sum(1 for t in toks if len(t) == 1),
    }
