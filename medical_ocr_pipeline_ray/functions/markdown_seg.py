"""Markdown heading/bullet segmentation.

Re-implements the reference's heading/bullet segmenter semantics
(``HEAD_RX``/``BULLET_RX`` + ALLCAPS heading rule and bullet-aware joins,
notebooks/02a_segment_general.ipynb:~24 ``segment_page``; bullet detector
``_BULLET_START`` in notebooks/01b_normalize_layout.ipynb:~23) for markdown
turns: the text passes through UNCHANGED (extraction is identity — markdown
is already content), but every line is span-tagged as heading / bullet /
main so downstream segment assembly can group on it.
"""

from __future__ import annotations

import re

HEAD_RX = re.compile(r"^#{1,6}\s+\S")
ALLCAPS_RX = re.compile(r"^[A-Z][A-Z0-9 \-:]{3,40}$")
BULLET_RX = re.compile(r"^\s*(?:[-*•·]|\d+[.)])\s+\S")

_MD_SIGNAL_RX = re.compile(r"(?m)^(?:#{1,6}\s+\S|\s*[-*•]\s+\S|\s*\d+[.)]\s+\S)")


def looks_like_markdown(text: str) -> bool:
    return bool(_MD_SIGNAL_RX.search(text))


def segment_markdown(raw: str) -> tuple[str, list[dict]]:
    """Returns (text_extracted == raw, line spans tagged heading/bullet/main)."""
    spans: list[dict] = []
    pos = 0
    for line in raw.split("\n"):
        start, end = pos, pos + len(line)
        pos = end + 1
        if not line.strip():
            continue
        if HEAD_RX.match(line) or ALLCAPS_RX.match(line.strip()):
            kind = "heading"
        elif BULLET_RX.match(line):
            kind = "bullet"
        else:
            kind = "main"
        spans.append({"start": start, "end": end, "kind": kind})
    return raw, spans
