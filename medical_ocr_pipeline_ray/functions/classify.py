"""Turn payload classification — the routing predicate for escalation.

The reference routes pages adaptively (cheap native extraction for easy
pages, heavy OCR only for hard ones — ``need_escalation`` / grid rescue,
notebooks/01_extract_blocks.ipynb:~25,~88, SURVEY.md L7).  The transcript
analogue classifies each turn's payload so that only expensive classes
(embedded document payloads, OCR-noisy text) reach the stateful actor-pool
stage; plain/HTML/markdown turns are handled in the cheap stateless stage.
"""

from __future__ import annotations

import re

from .markdown_seg import looks_like_markdown
from .ocr_correct import should_correct
from .pdfblocks import is_pdf_payload

_HTML_RX = re.compile(
    r"</?(?:p|div|span|a|nav|header|footer|aside|script|style|ul|ol|li|h[1-6]"
    r"|table|tr|td|th|body|html|head|title|br|section|article|main|form"
    r"|blockquote|pre)\b[^>]*>",
    re.IGNORECASE,
)

PAYLOAD_CLASSES = ("tool_pdf_payload", "html", "markdown", "ocr_noisy", "plain",
                   "empty")
# classes requiring the stateful/expensive stage (actor pool)
HEAVY_CLASSES = frozenset({"tool_pdf_payload", "ocr_noisy"})

# RE2-compatible pattern strings for the VECTORIZED classifier
# (pyarrow.compute.match_substring_regex = RE2).  Single source with the
# Python predicates above; any divergence is caught by the oracle-parity
# tests (the oracle classifies in Python, the Ray fast path in RE2).
HTML_PATTERN_RE2 = "(?i)" + _HTML_RX.pattern
MD_PATTERN_RE2 = r"(?m)^(?:#{1,6}\s+\S|\s*[-*•]\s+\S|\s*\d+[.)]\s+\S)"
NOISY_PATTERNS_RE2 = (r"[A-Za-z]\d[A-Za-z]", r"\b[l1I]{3,}\b", r"[;:!?]{2,}")
NOISY_LITERALS = ("@@", "||", "… …")


def classify_turn(text: str, tool: str) -> str:
    if not text or not text.strip():
        return "empty"
    if tool and is_pdf_payload(text):
        return "tool_pdf_payload"
    if _HTML_RX.search(text):
        return "html"
    if looks_like_markdown(text):
        return "markdown"
    if should_correct(text):
        return "ocr_noisy"
    return "plain"
