"""Deterministic OCR post-correction: char rules → dictionary → fuzzy vocab.

Re-implements, as pure deterministic functions, the reference's cleanup stack:

- ``apply_rules`` char normalizer (reference
  notebooks/02_cleanup_blocks.ipynb:~147: bullets→'.', dashes→'-', ×→x,
  collapse whitespace).  We map bullets to '-' (a marker that survives
  markdown bullet detection) and otherwise keep the same rule set.
- ``apply_dictionary`` case-aware whole-word replacement, longest-key-first
  (notebooks/02_cleanup_blocks.ipynb:~147 ``apply_dictionary`` /
  ``_case_aware``).
- ``apply_fuzzy`` vocabulary correction with difflib.get_close_matches,
  cutoff 0.86, correction cap, token regex ``[A-Za-z][A-Za-z\\-]{2,}``
  (notebooks/02_cleanup_blocks.ipynb:~147 ``apply_fuzzy``).
- digit-pattern invariance arbitration (notebooks/03_llm_cleanup.ipynb:~177
  ``choose_text`` / ``digits_pattern``): the risky correction tier (fuzzy,
  the analogue of the reference's LLM cleanup) is REJECTED wholesale if it
  changes the multiset of ``\\d+(?:\\.\\d+)?`` matches.  Rules+dictionary
  (the reference's unconditional stage-02 cleanup) apply unconditionally.

All state (compiled regexes, combined dictionary pattern, vocab set) is
module-level and built once per worker process — in the Ray pipeline this
lives in an actor's ``__init__`` (stages/correct_stage.py).
"""

from __future__ import annotations

import difflib
import re
from collections import Counter
from functools import lru_cache

# ---------------------------------------------------------------------------
# Built-in correction dictionary (analogue of BUILTIN_MAP merged with
# config/medical_terms.yml in the reference, 02_cleanup_blocks.ipynb:~147).
# wrong (lowercase) -> right.  Longest-key-first application order.
# ---------------------------------------------------------------------------
BUILTIN_MAP: dict[str, str] = {
    "necrosls": "necrosis",
    "microscoplc": "microscopic",
    "micr0scopic": "microscopic",
    "dlagnosis": "diagnosis",
    "diagn0sis": "diagnosis",
    "patlent": "patient",
    "pat1ent": "patient",
    "radiologv": "radiology",
    "prescriptlon": "prescription",
    "tabiet": "tablet",
    "tab1et": "tablet",
    "capsuie": "capsule",
    "histopathoiogy": "histopathology",
    "carcin0ma": "carcinoma",
    "lnflammation": "inflammation",
    "speclmen": "specimen",
    "blopsy": "biopsy",
    "radlograph": "radiograph",
    "fracture5": "fractures",
    "medicatlon": "medication",
    "frequencv": "frequency",
    "morningg": "morning",
    "eveningg": "evening",
    "hospitai": "hospital",
    "ciinical": "clinical",
    "resuits": "results",
    "normai": "normal",
    "abnormai": "abnormal",
    "positlve": "positive",
    "negatlve": "negative",
}

# Vocabulary for fuzzy correction (analogue of the sciSpaCy/terms vocab the
# reference builds its fuzzy index from).  Deterministic, sorted at build.
VOCAB_WORDS: tuple[str, ...] = tuple(sorted({
    # general
    "about", "after", "again", "analysis", "appears", "because", "before",
    "between", "clinical", "common", "complete", "consistent", "control",
    "course", "current", "daily", "detail", "during", "evening", "evidence",
    "examination", "finding", "findings", "follow", "following", "further",
    "general", "history", "hospital", "impression", "include", "including",
    "interval", "morning", "moderate", "multiple", "normal", "noted",
    "observed", "patient", "performed", "present", "previous", "procedure",
    "process", "recommend", "recommended", "record", "regular", "related",
    "report", "reported", "result", "results", "review", "routine", "sample",
    "section", "severe", "showing", "significant", "slight", "stable",
    "status", "structure", "summary", "surface", "through", "tissue",
    "treatment", "unremarkable", "visible", "within", "without",
    # domain terms (reference config/medical_terms.yml analogue)
    "abdomen", "abnormal", "acute", "benign", "biopsy", "capsule",
    "carcinoma", "cardiac", "chronic", "diagnosis", "dosage", "fracture",
    "fractures", "frequency", "histopathology", "infection", "inflammation",
    "lesion", "malignant", "medication", "microscopic", "mucosa", "necrosis",
    "negative", "nodule", "pathology", "positive", "prescription",
    "radiograph", "radiology", "specimen", "tablet", "therapy", "thorax",
}))

STOPWORDS: frozenset[str] = frozenset({
    "the", "and", "for", "are", "but", "not", "you", "all", "can", "had",
    "her", "was", "one", "our", "out", "day", "get", "has", "him", "his",
    "how", "man", "new", "now", "old", "see", "two", "way", "who", "with",
    "this", "that", "from", "they", "will", "have", "been", "were", "than",
})

# --- compiled patterns (once per process) ----------------------------------
_RULES = (
    (re.compile(r"[•·∙●]"), "-"),   # bullets • · ∙ ● → -
    (re.compile(r"[–—−]"), "-"),          # – — − → -
    (re.compile(r"×"), "x"),                        # × → x
    (re.compile(r"[ \t\f\v]+"), " "),                    # collapse h-space
)
_DICT_RX = re.compile(
    r"\b(" + "|".join(sorted((re.escape(k) for k in BUILTIN_MAP), key=len, reverse=True)) + r")\b",
    re.IGNORECASE,
)
_FUZZY_TOKEN_RX = re.compile(r"[A-Za-z][A-Za-z\-]{2,}")
_DIGIT_RX = re.compile(r"\d+(?:\.\d+)?")
_VOCAB_SET = frozenset(VOCAB_WORDS)

# should_cleanup predicate (reference notebooks/03_llm_cleanup.ipynb:~177
# ``should_cleanup``): noisy tokens, OCR-ish letter-digit-letter pattern,
# l/1/I runs, punctuation clusters.
_NOISY_TOKENS = ("@@", "||", "… …")
_OCRISH_RX = re.compile(r"[A-Za-z]\d[A-Za-z]")
_L1I_RX = re.compile(r"\b[l1I]{3,}\b")
_PUNCT_CLUSTER_RX = re.compile(r"[;:!?]{2,}")


def should_correct(text: str) -> bool:
    """Predicate routing a turn to the correction tier (reference M12)."""
    if not text:
        return False
    if any(tok in text for tok in _NOISY_TOKENS):
        return True
    return bool(
        _OCRISH_RX.search(text)
        or _L1I_RX.search(text)
        or _PUNCT_CLUSTER_RX.search(text)
    )


def apply_rules(text: str) -> str:
    """Char-level normalization (reference M7). Newlines are preserved."""
    out = text
    for rx, rep in _RULES:
        out = rx.sub(rep, out)
    # collapse spaces around newlines, keep newlines
    out = re.sub(r" ?\n ?", "\n", out)
    return out.strip()


def _case_like(src: str, repl: str) -> str:
    """Propagate the source token's casing onto the replacement
    (reference ``_case_aware``, 02_cleanup_blocks.ipynb:~147)."""
    if src.isupper():
        return repl.upper()
    if src[:1].isupper():
        return repl[:1].upper() + repl[1:]
    return repl


def apply_dictionary(text: str) -> str:
    """Case-aware whole-word dictionary replacement (reference M8)."""
    def _sub(m: re.Match) -> str:
        return _case_like(m.group(0), BUILTIN_MAP[m.group(0).lower()])
    return _DICT_RX.sub(_sub, text)


@lru_cache(maxsize=65536)
def _close_match(word_lower: str, cutoff: float) -> str | None:
    got = difflib.get_close_matches(word_lower, VOCAB_WORDS, n=1, cutoff=cutoff)
    return got[0] if got else None


def apply_fuzzy(text: str, cutoff: float = 0.86, max_corr: int = 200,
                min_len: int = 3) -> str:
    """Fuzzy vocab correction (reference M9): unknown alpha tokens snapped to
    the closest vocab word at similarity >= cutoff; case-preserving; capped."""
    corrections: dict[str, str] = {}
    seen: set[str] = set()
    for m in _FUZZY_TOKEN_RX.finditer(text):
        w = m.group(0)
        lw = w.lower()
        if lw in seen:
            continue
        seen.add(lw)
        if len(lw) < min_len or lw in _VOCAB_SET or lw in STOPWORDS:
            continue
        if w.isupper():        # do-not-touch: acronyms
            continue
        best = _close_match(lw, cutoff)
        if best and best != lw:
            corrections[lw] = best
            if len(corrections) >= max_corr:
                break
    if not corrections:
        return text

    rx = re.compile(
        r"\b(" + "|".join(sorted((re.escape(k) for k in corrections), key=len,
                                 reverse=True)) + r")\b",
        re.IGNORECASE,
    )

    def _sub(m: re.Match) -> str:
        src = m.group(0)
        return _case_like(src, corrections.get(src.lower(), src))

    return rx.sub(_sub, text)


def digits_pattern(text: str) -> Counter:
    """Multiset of numeric tokens (reference ``digits_pattern``,
    03_llm_cleanup.ipynb:~177)."""
    return Counter(_DIGIT_RX.findall(text))


def correct_text(text: str, cutoff: float = 0.86, max_corr: int = 200) -> str:
    """Full correction stack with digit-invariance arbitration.

    rules+dictionary apply unconditionally (reference stage 02); fuzzy (the
    risky tier, analogue of stage-03 LLM cleanup) is rejected wholesale if it
    alters the numeric-token multiset (reference ``choose_text`` M13).
    """
    base = apply_dictionary(apply_rules(text))
    fuzzed = apply_fuzzy(base, cutoff=cutoff, max_corr=max_corr)
    if digits_pattern(fuzzed) != digits_pattern(base):
        return base
    return fuzzed
