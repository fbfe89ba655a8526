"""Layout analysis for embedded document payloads in tool-output turns.

A tool turn may embed a structured pseudo-PDF text stream (the transcript
analogue of the reference's PDF pages): a ``%PDFBLOCKS`` header, per-page
``P`` records and positioned line records ``B x0 y0 x1 y1 conf source|text``.
This module parses the stream and re-implements the reference's per-page
layout pipeline as pure deterministic functions:

- confidence filter (min_conf 0.50 — notebooks/01_extract_blocks.ipynb:~25,
  applied in each ``extract_*``),
- reading-order sort on ``(round(y0,1), round(x0,1))``
  (``blocks_sort_key``, notebooks/01_extract_blocks.ipynb:~207),
- greedy near-dedup: confidence-descending scan dropping a block when IoU
  >= 0.50 against a kept block AND text similarity >= 0.92
  (``deduplicate``, notebooks/01_extract_blocks.ipynb:~207; thresholds
  ``dedup_iou_thr``/``dedup_sim_thr`` at :~25),
- line assembly with y-tolerance 14 px, x-sort within line, paragraph join
  at y-gap 26 px (``regroup_lines``, notebooks/01_extract_blocks.ipynb:~207),
- header/footer band TAGGING, never deletion (``adaptive_bands``,
  notebooks/01b_normalize_layout.ipynb:~23): band blocks keep spans with
  kind header/footer but are excluded from the main extracted text.

The greedy dedup is order-dependent, so the scan order is fully
deterministic: ``(-conf, len(text), round(y0,1), round(x0,1), text)``
(reference precedence sort ``(-conf, len(text))`` plus position/text
tie-breaks for stability across batch splits — SURVEY.md §4.3).
"""

from __future__ import annotations

import difflib
import re
from dataclasses import dataclass

MAGIC = "%PDFBLOCKS"
_B_RX = re.compile(
    r"^B (-?\d+(?:\.\d+)?) (-?\d+(?:\.\d+)?) (-?\d+(?:\.\d+)?) (-?\d+(?:\.\d+)?)"
    r" (\d+(?:\.\d+)?) ([A-Za-z0-9_+\-]+)\|"
)
_P_RX = re.compile(r"^P (\d+) (\d+(?:\.\d+)?) (\d+(?:\.\d+)?)$")


@dataclass
class Block:
    page: int
    x0: float
    y0: float
    x1: float
    y1: float
    conf: float
    source: str
    text: str
    span_start: int   # offset of text within the raw payload
    span_end: int
    band: str = "body"   # body | header | footer


def is_pdf_payload(text: str) -> bool:
    return text.startswith(MAGIC)


def iou(a: Block, b: Block) -> float:
    """Axis-aligned bbox IoU (reference ``iou``,
    notebooks/01_extract_blocks.ipynb:~207)."""
    ix0, iy0 = max(a.x0, b.x0), max(a.y0, b.y0)
    ix1, iy1 = min(a.x1, b.x1), min(a.y1, b.y1)
    iw, ih = max(0.0, ix1 - ix0), max(0.0, iy1 - iy0)
    inter = iw * ih
    if inter <= 0:
        return 0.0
    area_a = max(0.0, a.x1 - a.x0) * max(0.0, a.y1 - a.y0)
    area_b = max(0.0, b.x1 - b.x0) * max(0.0, b.y1 - b.y0)
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def text_sim(a: str, b: str) -> float:
    """Similarity ratio (reference uses rapidfuzz.fuzz.ratio with a difflib
    fallback, notebooks/01_extract_blocks.ipynb:~207 ``fuzz_ratio``; we pin
    the difflib implementation for cross-platform determinism)."""
    return difflib.SequenceMatcher(None, a, b).ratio()


def parse_payload(raw: str, min_conf: float = 0.50,
                  header_frac: float = 0.10, footer_frac: float = 0.10,
                  ) -> tuple[list[Block], list[Block], list[dict]]:
    """Parse a %PDFBLOCKS payload.

    Returns (kept_blocks, lowconf_blocks, spans_for_dropped) with band tags
    assigned per page geometry.
    """
    kept: list[Block] = []
    low: list[Block] = []
    spans: list[dict] = []
    page_no, page_h = 1, 1000.0
    pos = 0
    for line in raw.split("\n"):
        start = pos
        pos += len(line) + 1
        pm = _P_RX.match(line)
        if pm:
            page_no = int(pm.group(1))
            page_h = float(pm.group(3))
            continue
        bm = _B_RX.match(line)
        if not bm:
            continue
        x0, y0, x1, y1 = (float(bm.group(i)) for i in range(1, 5))
        conf = float(bm.group(5))
        if conf > 1.0:   # percentages normalized (reference norm_conf,
            conf /= 100  # notebooks/01_blocks_all_mcp_compare.ipynb:~80)
        source = bm.group(6)
        t_start = start + bm.end()
        t_end = start + len(line)
        text = line[bm.end():]
        blk = Block(page_no, x0, y0, x1, y1, conf, source, text,
                    t_start, t_end)
        if y0 < header_frac * page_h:
            blk.band = "header"
        elif y1 > (1.0 - footer_frac) * page_h:
            blk.band = "footer"
        if conf < min_conf:
            low.append(blk)
            spans.append({"start": t_start, "end": t_end, "kind": "lowconf"})
        else:
            kept.append(blk)
    return kept, low, spans


def dedup_blocks(blocks: list[Block], iou_thr: float = 0.50,
                 sim_thr: float = 0.92) -> tuple[list[Block], list[Block]]:
    """Greedy per-page near-dedup (reference D1).  O(n²) but page/turn-local,
    so it stays inside a single map_batches call — no shuffle."""
    order = sorted(
        blocks,
        key=lambda b: (-b.conf, len(b.text), round(b.y0, 1), round(b.x0, 1),
                       b.text),
    )
    kept: list[Block] = []
    dropped: list[Block] = []
    for b in order:
        dup = any(
            a.page == b.page and iou(a, b) >= iou_thr
            and text_sim(a.text, b.text) >= sim_thr
            for a in kept
        )
        (dropped if dup else kept).append(b)
    return kept, dropped


def regroup_lines(blocks: list[Block], tol_y: float = 14.0,
                  para_gap: float = 26.0) -> list[list[Block]]:
    """Reading-order sort → line assembly → paragraph grouping (reference
    L1 ``regroup_lines``).  Returns paragraphs as lists of blocks."""
    ordered = sorted(blocks, key=lambda b: (b.page, round(b.y0, 1),
                                            round(b.x0, 1), b.text))
    lines: list[list[Block]] = []
    for b in ordered:
        if lines and lines[-1][0].page == b.page and \
                abs(b.y0 - lines[-1][0].y0) <= tol_y:
            lines[-1].append(b)
        else:
            lines.append([b])
    for ln in lines:
        ln.sort(key=lambda b: (round(b.x0, 1), b.text))
    paras: list[list[Block]] = []
    for ln in lines:
        if paras and paras[-1][-1].page == ln[0].page and \
                (ln[0].y0 - paras[-1][-1].y0) <= para_gap:
            paras[-1].extend(ln)
        else:
            paras.append(list(ln))
    return paras


def extract_pdf_payload(raw: str, min_conf: float = 0.50,
                        iou_thr: float = 0.50, sim_thr: float = 0.92,
                        tol_y: float = 14.0, para_gap: float = 26.0,
                        header_frac: float = 0.10, footer_frac: float = 0.10,
                        ) -> tuple[str, list[dict], int, int]:
    """Full per-turn layout pipeline for an embedded document payload.

    Returns (text_extracted, spans, blocks_kept, blocks_dropped_dup).
    Extracted text = body paragraphs in reading order, lines joined by a
    space within a paragraph, paragraphs joined by newline.  Header/footer
    blocks are span-tagged but excluded from the text (strip-but-account).
    """
    parsed, _low, spans = parse_payload(raw, min_conf, header_frac,
                                        footer_frac)
    kept, dropped = dedup_blocks(parsed, iou_thr, sim_thr)
    for d in dropped:
        spans.append({"start": d.span_start, "end": d.span_end, "kind": "dup"})
    body = [b for b in kept if b.band == "body"]
    for b in kept:
        kind = "doc_payload" if b.band == "body" else b.band
        spans.append({"start": b.span_start, "end": b.span_end, "kind": kind})
    paras = regroup_lines(body, tol_y, para_gap)
    text = "\n".join(" ".join(b.text for b in para).strip() for para in paras)
    spans.sort(key=lambda d: (d["start"], d["end"], d["kind"]))
    return text, spans, len(kept), len(dropped)
