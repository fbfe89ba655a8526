"""Byte-stream HTML tokenizer → block tree → boilerplate classifier.

Main-content extraction for HTML turns, built from scratch on public
Readability/Trafilatura-style heuristics: segment the document into blocks
at block-level tags, score each block by text mass and link density plus
structural ancestry (nav/header/footer/aside/script/style), keep the main
blocks, and emit (extracted_text, char-spans-into-raw).

The reference's analogues are the banner mask + header/footer tagging
(``mask_bands`` in notebooks/01_extract_blocks.ipynb:~207, ``adaptive_bands``
in notebooks/01b_normalize_layout.ipynb:~23 — tag, never destroy) and the
HTML tag strip regex (notebooks/01_qa_pipeline_evaluation.ipynb:~117
``_HTML_TAG_RE``), generalized here into a proper block-tree classifier.

Pure, deterministic, no state: runs inside ``map_batches`` row-wise (string
parsing has no Arrow kernel; the batch wrapper lives in stages/).
Spans index into the RAW text (never re-derived from mutated text).
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass, field

_TAG_RX = re.compile(r"<!--.*?-->|<[!/]?[a-zA-Z][^>]*>", re.DOTALL)
_WS_RX = re.compile(r"\s+")

BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "li", "ul", "ol", "h1", "h2", "h3",
    "h4", "h5", "h6", "table", "tr", "td", "th", "br", "nav", "header",
    "footer", "aside", "main", "blockquote", "pre", "body", "html", "head",
    "title", "form", "figure", "figcaption",
})
# structural boilerplate containers: all text under these is boilerplate
BOILER_TAGS = frozenset({"nav", "header", "footer", "aside", "head", "title", "form"})
# raw-text containers whose content is never content
DROP_TAGS = frozenset({"script", "style", "noscript", "template"})
LINK_TAGS = frozenset({"a"})
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_VOID_TAGS = frozenset({"br", "hr", "img", "meta", "link", "input"})


@dataclass
class _Block:
    """One block-tree leaf: text nodes between block-tag boundaries."""
    nodes: list[tuple[int, int]] = field(default_factory=list)  # raw offsets
    texts: list[str] = field(default_factory=list)               # decoded
    link_chars: int = 0
    chars: int = 0
    boiler: bool = False     # under nav/header/footer/aside/head/form
    heading: bool = False    # under h1..h6


def _tag_name(tok: str) -> tuple[str, bool]:
    """('div', is_closing) for a tag token; ('!', False) for comments/doctype.

    Hand-rolled scan (no regex) — this runs once per tag token and is the
    tokenizer's hottest helper."""
    body = tok[1:-1]
    i, n = 0, len(body)
    while i < n and body[i] in " \t\n\r":
        i += 1
    if i >= n or body[i] == "!":
        return "!", False
    closing = body[i] == "/"
    if closing:
        i += 1
    j = i
    while j < n and body[j].isalnum():
        j += 1
    if j == i or not body[i].isalpha():
        return "!", False
    return body[i:j].lower(), closing


def parse_blocks(raw: str) -> list[_Block]:
    """Single forward scan building the flat block list with ancestry flags."""
    blocks: list[_Block] = []
    cur = _Block()
    boiler_depth = 0
    drop_depth = 0
    link_depth = 0
    heading_depth = 0
    pos = 0

    def flush() -> None:
        nonlocal cur
        if cur.nodes:
            blocks.append(cur)
        cur = _Block(boiler=boiler_depth > 0, heading=heading_depth > 0)

    for m in _TAG_RX.finditer(raw):
        if m.start() > pos:
            seg = raw[pos:m.start()]
            if seg.strip() and drop_depth == 0:
                decoded = _htmllib.unescape(seg)
                n = len(_WS_RX.sub(" ", decoded).strip())
                cur.nodes.append((pos, m.start()))
                cur.texts.append(decoded)
                cur.chars += n
                if link_depth > 0:
                    cur.link_chars += n
                if boiler_depth > 0:
                    cur.boiler = True
                if heading_depth > 0:
                    cur.heading = True
        pos = m.end()
        tok = m.group(0)
        if tok.startswith("<!--") or tok.startswith("<!"):
            continue
        name, closing = _tag_name(tok)
        if name == "!":
            continue
        self_closing = tok.endswith("/>") or name in _VOID_TAGS
        if name in DROP_TAGS:
            if closing:
                drop_depth = max(0, drop_depth - 1)
            elif not self_closing:
                drop_depth += 1
            continue
        if name in LINK_TAGS:
            if closing:
                link_depth = max(0, link_depth - 1)
            elif not self_closing:
                link_depth += 1
            continue
        if name in BLOCK_TAGS:
            flush()
            if name in BOILER_TAGS:
                boiler_depth = (max(0, boiler_depth - 1) if closing
                                else boiler_depth + (0 if self_closing else 1))
            if name in HEADING_TAGS:
                heading_depth = (max(0, heading_depth - 1) if closing
                                 else heading_depth + (0 if self_closing else 1))
            cur.boiler = boiler_depth > 0
            cur.heading = heading_depth > 0
    if pos < len(raw):
        seg = raw[pos:]
        if seg.strip() and drop_depth == 0:
            decoded = _htmllib.unescape(seg)
            n = len(_WS_RX.sub(" ", decoded).strip())
            cur.nodes.append((pos, len(raw)))
            cur.texts.append(decoded)
            cur.chars += n
            if link_depth > 0:
                cur.link_chars += n
    if cur.nodes:
        blocks.append(cur)
    return blocks


def classify_block(b: _Block, link_density_thr: float = 0.50,
                   short_block_chars: int = 25,
                   short_block_link_thr: float = 0.20) -> bool:
    """True if the block is boilerplate (link-farm / structural chrome)."""
    if b.boiler:
        return True
    if b.chars <= 0:
        return True
    ld = b.link_chars / b.chars
    if ld > link_density_thr:
        return True
    if b.chars < short_block_chars and ld > short_block_link_thr:
        return True
    return False


def extract_html(raw: str, link_density_thr: float = 0.50,
                 short_block_chars: int = 25,
                 short_block_link_thr: float = 0.20,
                 ) -> tuple[str, list[dict]]:
    """Extract main content from an HTML turn.

    Returns (text_extracted, spans) where spans are
    ``{"start", "end", "kind"}`` char offsets into the RAW text with kind in
    {main, heading, boilerplate}; extracted text is the whitespace-collapsed
    main blocks joined by newline (headings are kept as content lines —
    the reference keeps headings for the segmenter, 02a_segment_general).
    """
    blocks = parse_blocks(raw)
    out_lines: list[str] = []
    spans: list[dict] = []
    for b in blocks:
        boiler = classify_block(b, link_density_thr, short_block_chars,
                                short_block_link_thr)
        kind = "boilerplate" if boiler else ("heading" if b.heading else "main")
        for (s, e) in b.nodes:
            spans.append({"start": s, "end": e, "kind": kind})
        if not boiler:
            line = _WS_RX.sub(" ", " ".join(b.texts)).strip()
            if line:
                out_lines.append(line)
    spans.sort(key=lambda d: (d["start"], d["end"]))
    return "\n".join(out_lines), spans
