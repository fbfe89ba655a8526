"""Per-turn extraction dispatcher — THE deterministic extraction semantics.

One pure function ``extract_turn(text, tool)`` that classifies the payload
and applies the matching extractor:

- plain        → identity text, single main span (reference native-text fast
                 path, ``extract_native`` notebooks/01_extract_blocks.ipynb:~207)
- html         → block-tree boilerplate strip (functions/html_extract.py)
- markdown     → identity text + heading/bullet line spans
                 (functions/markdown_seg.py)
- ocr_noisy    → rules/dictionary/fuzzy correction with digit invariance
                 (functions/ocr_correct.py)
- tool_pdf_payload → positioned-block layout pipeline
                 (functions/pdfblocks.py)
- empty        → empty output, no spans

Both the single-process oracle (oracle.py) and the Ray Data stages
(stages/) call THIS function, so per-turn semantics have exactly one
definition; distribution correctness (batching, routing, ordering,
assembly) is what the oracle-vs-Ray equality tests exercise.

Spans always index into the RAW text and are never re-derived from mutated
text (SURVEY.md §7.5 span bookkeeping).
"""

from __future__ import annotations

from typing import NamedTuple

from ..config import DEFAULT_EXTRACT, ExtractConfig
from .classify import classify_turn
from .html_extract import extract_html
from .markdown_seg import segment_markdown
from .ocr_correct import correct_text
from .pdfblocks import extract_pdf_payload


class TurnExtract(NamedTuple):
    payload_class: str
    text_extracted: str
    spans: list[dict]          # {"start","end","kind"} into raw text
    blocks_kept: int
    blocks_dropped_dup: int


def extract_turn(text: str, tool: str = "",
                 cfg: ExtractConfig = DEFAULT_EXTRACT,
                 cls: str | None = None) -> TurnExtract:
    text = text if isinstance(text, str) else ("" if text is None else str(text))
    if cls is None:
        cls = classify_turn(text, tool)
    if cls == "empty":
        return TurnExtract(cls, "", [], 0, 0)
    if cls == "plain":
        return TurnExtract(cls, text,
                           [{"start": 0, "end": len(text), "kind": "main"}],
                           1, 0)
    if cls == "markdown":
        out, spans = segment_markdown(text)
        return TurnExtract(cls, out, spans, len(spans), 0)
    if cls == "html":
        out, spans = extract_html(
            text, cfg.link_density_thr, cfg.short_block_chars,
            cfg.short_block_link_thr)
        kept = sum(1 for s in spans if s["kind"] in ("main", "heading"))
        return TurnExtract(cls, out, spans, kept, 0)
    if cls == "ocr_noisy":
        out = correct_text(text, cutoff=cfg.fuzzy_cutoff,
                           max_corr=cfg.fuzzy_max_corr)
        return TurnExtract(cls, out,
                           [{"start": 0, "end": len(text), "kind": "main"}],
                           1, 0)
    # tool_pdf_payload
    out, spans, kept, dropped = extract_pdf_payload(text, cfg)
    return TurnExtract(cls, out, spans, kept, dropped)
