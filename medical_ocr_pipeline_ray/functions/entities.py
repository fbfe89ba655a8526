"""Deterministic entity annotation — the NER/UMLS-annotate analogue.

The reference annotates blocks with scispaCy entities and QuickUMLS CUI
hits WITHOUT mutating text (M10, notebooks/02_cleanup_blocks.ipynb:~49,
~147 ``scispacy_normalize`` / ``quickumls_normalize``).  The external
models are absent here (declared non-goal), so this module implements the
same CONTRACT deterministically: span-tagged entity annotations over the
extracted text, text untouched — a dictionary/pattern matcher standing in
for the model forward pass (swap the ``_match`` kernel for a real NER
model inside the same actor-pool stage when one is available).

Entity kinds:
- ``drug``  — lexicon match (drug-name dictionary; case-insensitive,
  whole word),
- ``dose``  — dosage pattern ``\\d+ mg`` (digit fidelity guaranteed by
  the extraction layer's digit-invariance M13),
- ``test``  — multi-word procedure-name lexicon match.
"""

from __future__ import annotations

import re

# compact public-style lexicons (aligned with the synth corpus so planted
# entities are recoverable; a real deployment loads its own terminology —
# the reference's medical_terms.yml override mechanism, S9)
DRUG_TERMS = ("amoxicillin", "ibuprofen", "metformin", "lisinopril",
              "omeprazole", "atorvastatin")
TEST_TERMS = ("blood count", "lipid panel", "chest imaging",
              "glucose test", "thyroid panel")

_DRUG_RX = re.compile(
    r"\b(" + "|".join(DRUG_TERMS) + r")\b", re.IGNORECASE)
_DOSE_RX = re.compile(r"\b(\d+\s*mg)\b")
_TEST_RX = re.compile(
    r"\b(" + "|".join(t.replace(" ", r"\s+") for t in TEST_TERMS) + r")\b",
    re.IGNORECASE)

_KINDS = (("drug", _DRUG_RX), ("dose", _DOSE_RX), ("test", _TEST_RX))


def annotate_entities(text: str) -> list[dict]:
    """Span-tagged entities over ``text`` (offsets into the given text),
    sorted by (start, end, kind) — deterministic, text never mutated."""
    out: list[dict] = []
    for kind, rx in _KINDS:
        for m in rx.finditer(text or ""):
            out.append({"start": m.start(1), "end": m.end(1),
                        "text": m.group(1), "kind": kind})
    out.sort(key=lambda d: (d["start"], d["end"], d["kind"]))
    return out
