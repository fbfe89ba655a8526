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
- ADAPTIVE line assembly (reference ``merge_rows``,
  notebooks/01b_normalize_layout.ipynb:~23): tolerances scaled by the
  page's median text height (tol_y = 0.60·med_h, paragraph gap =
  1.60·med_h), falling back to the fixed 14 px / 26 px of
  ``regroup_lines`` (notebooks/01_extract_blocks.ipynb:~207) when a page
  has no measurable blocks,
- handwriting detection by text-height IQR (reference
  ``detect_handwriting``, notebooks/01b_normalize_layout.ipynb:~23):
  IQR > 0.35·med_h shrinks the header/footer bands (×0.5) — irregular
  hand-written pages have content closer to the page edges,
- two-column split (reference ``maybe_two_columns``,
  notebooks/01b_normalize_layout.ipynb:~23): deterministic 2-means on
  block x-centers; split only when the cluster separation ≥ 0.12·page
  width AND the columns are horizontally disjoint (the disjointness
  guard is ours — it keeps pages that merely contain split-row fragments
  from being mis-read as two-column); reading order = left column fully,
  then right column,
- header/footer band TAGGING, never deletion (``adaptive_bands``,
  notebooks/01b_normalize_layout.ipynb:~23): band blocks keep spans with
  kind header/footer but are excluded from the main extracted text,
- rescue escalation (reference ``GRID_RESCUE``,
  notebooks/01_extract_blocks.ipynb:~88): when the first pass yields
  anomalously little body text (< rescue_min_chars), low-confidence
  blocks above ``rescue_conf`` are promoted and the layout pass re-runs —
  the output-quality-triggered second tier of the fast/heavy policy.

The greedy dedup is order-dependent, so the scan order is fully
deterministic: ``(-conf, len(text), round(y0,1), round(x0,1), text)``
(reference precedence sort ``(-conf, len(text))`` plus position/text
tie-breaks for stability across batch splits — SURVEY.md §4.3).
"""

from __future__ import annotations

import difflib
import re
from dataclasses import dataclass

from ..config import DEFAULT_EXTRACT, ExtractConfig

MAGIC = "%PDFBLOCKS"
_B_RX = re.compile(
    r"^B (-?\d+(?:\.\d+)?) (-?\d+(?:\.\d+)?) (-?\d+(?:\.\d+)?) (-?\d+(?:\.\d+)?)"
    r" (\d+(?:\.\d+)?) ([A-Za-z0-9_+\-]+)\|"
)
_P_RX = re.compile(r"^P (\d+) (\d+(?:\.\d+)?) (\d+(?:\.\d+)?)$")

_DEFAULT_PAGE = (800.0, 1000.0)


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
                  ) -> tuple[list[Block], list[Block],
                             dict[int, tuple[float, float]]]:
    """Parse a %PDFBLOCKS payload.

    Returns (kept_blocks, lowconf_blocks, pages) where ``pages`` maps page
    number → (width, height).  Band tagging happens later (it is adaptive —
    see ``assign_bands``)."""
    kept: list[Block] = []
    low: list[Block] = []
    pages: dict[int, tuple[float, float]] = {}
    page_no = 1
    pos = 0
    for line in raw.split("\n"):
        start = pos
        pos += len(line) + 1
        pm = _P_RX.match(line)
        if pm:
            page_no = int(pm.group(1))
            pages[page_no] = (float(pm.group(2)), float(pm.group(3)))
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
        (kept if conf >= min_conf else low).append(blk)
    return kept, low, pages


def page_stats(blocks: list[Block]) -> tuple[float, float]:
    """(median text height, IQR of text heights) for one page's blocks —
    nearest-rank quartiles for determinism (reference ``merge_rows`` /
    ``detect_handwriting`` statistics, 01b_normalize_layout.ipynb:~23)."""
    hs = sorted(max(0.0, b.y1 - b.y0) for b in blocks)
    n = len(hs)
    if n == 0:
        return 0.0, 0.0
    med = hs[n // 2] if n % 2 == 1 else 0.5 * (hs[n // 2 - 1] + hs[n // 2])
    return med, hs[(3 * n) // 4 if (3 * n) // 4 < n else n - 1] - hs[n // 4]


def assign_bands(blocks: list[Block],
                 pages: dict[int, tuple[float, float]],
                 header_frac: float, footer_frac: float,
                 hw_pages: set[int], hw_shrink: float = 0.5) -> None:
    """Tag header/footer bands in place.  Handwriting pages (irregular
    text heights) get shrunken bands (reference ``adaptive_bands`` +
    ``detect_handwriting``, 01b_normalize_layout.ipynb:~23)."""
    for b in blocks:
        _w, page_h = pages.get(b.page, _DEFAULT_PAGE)
        shrink = hw_shrink if b.page in hw_pages else 1.0
        if b.y0 < header_frac * shrink * page_h:
            b.band = "header"
        elif b.y1 > (1.0 - footer_frac * shrink) * page_h:
            b.band = "footer"
        else:
            b.band = "body"


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


def maybe_two_columns(blocks: list[Block], page_w: float,
                      min_sep_frac: float = 0.12,
                      ) -> tuple[list[Block], list[Block]] | None:
    """Deterministic 2-means on block x-centers (reference
    ``maybe_two_columns``, 01b_normalize_layout.ipynb:~23).

    Split only when (a) both clusters have ≥ 2 blocks, (b) the cluster
    centers are ≥ min_sep_frac·page_w apart, (c) the columns are
    horizontally DISJOINT (left column's max x1 ≤ right column's min x0),
    and (d) the two sides' row grids are NOT y-aligned (≥ half the right
    blocks sharing a y0 with a left block means the page is made of rows
    split into left/right fragments, not independent columns — real
    columns wrap text independently, so their baselines interleave).
    Guards (c)/(d) are additions over the reference to keep split-row
    pages from being mis-read as two-column."""
    if len(blocks) < 4:
        return None
    xc = [0.5 * (b.x0 + b.x1) for b in blocks]
    c1, c2 = min(xc), max(xc)
    if c1 == c2:
        return None
    for _ in range(10):   # fixed-iteration Lloyd steps — deterministic
        left = [x for x in xc if abs(x - c1) <= abs(x - c2)]
        right = [x for x in xc if abs(x - c1) > abs(x - c2)]
        if not left or not right:
            return None
        n1, n2 = sum(left) / len(left), sum(right) / len(right)
        if n1 == c1 and n2 == c2:
            break
        c1, c2 = n1, n2
    if abs(c2 - c1) < min_sep_frac * page_w:
        return None
    lb = [b for b, x in zip(blocks, xc) if abs(x - c1) <= abs(x - c2)]
    rb = [b for b, x in zip(blocks, xc) if abs(x - c1) > abs(x - c2)]
    if len(lb) < 2 or len(rb) < 2:
        return None
    if max(b.x1 for b in lb) > min(b.x0 for b in rb):
        return None   # overlapping x-extents → not a real column split
    left_y = {round(b.y0, 1) for b in lb}
    aligned = sum(1 for b in rb if round(b.y0, 1) in left_y)
    if aligned * 2 >= len(rb):
        return None   # y-aligned row grid → split rows, not columns
    return lb, rb


def regroup_lines(blocks: list[Block], tol_y: float = 14.0,
                  para_gap: float = 26.0) -> list[list[Block]]:
    """Reading-order sort → line assembly → paragraph grouping (reference
    L1 ``regroup_lines``).  Page-local (callers iterate pages/columns).
    Returns paragraphs as lists of blocks."""
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


def _layout_pass(blocks: list[Block],
                 pages: dict[int, tuple[float, float]],
                 cfg: ExtractConfig,
                 rescued_ids: frozenset = frozenset(),
                 ) -> tuple[str, list[dict], int, int]:
    """One full layout pass over already-parsed blocks: page stats →
    adaptive bands → dedup → per-page two-column split → per-column
    regroup → text + spans."""
    by_page: dict[int, list[Block]] = {}
    for b in blocks:
        by_page.setdefault(b.page, []).append(b)
    stats = {p: page_stats(bs) for p, bs in by_page.items()}
    hw_pages = {p for p, (med, iqr) in stats.items()
                if med > 0 and iqr > cfg.hw_iqr_factor * med}
    assign_bands(blocks, pages, cfg.header_band_frac, cfg.footer_band_frac,
                 hw_pages, cfg.hw_band_shrink)
    kept, dropped = dedup_blocks(blocks, cfg.dedup_iou_thr,
                                 cfg.dedup_sim_thr)
    spans: list[dict] = []
    for d in dropped:
        spans.append({"start": d.span_start, "end": d.span_end,
                      "kind": "dup"})
    for b in kept:
        if b.band != "body":
            kind = b.band
        elif id(b) in rescued_ids:
            kind = "rescued"
        else:
            kind = "doc_payload"
        spans.append({"start": b.span_start, "end": b.span_end,
                      "kind": kind})
    body_by_page: dict[int, list[Block]] = {}
    for b in kept:
        if b.band == "body":
            body_by_page.setdefault(b.page, []).append(b)
    para_texts: list[str] = []
    for p in sorted(body_by_page):
        body = body_by_page[p]
        med, _iqr = stats.get(p, (0.0, 0.0))
        if cfg.adaptive_layout and med > 0:
            tol_y = cfg.line_tol_med_factor * med
            para_gap = cfg.para_gap_med_factor * med
        else:
            tol_y, para_gap = cfg.line_tol_y, cfg.para_gap_y
        page_w = pages.get(p, _DEFAULT_PAGE)[0]
        cols = maybe_two_columns(body, page_w,
                                 cfg.two_column_min_sep_frac) \
            if cfg.adaptive_layout else None
        for col in (cols if cols else (body,)):
            for para in regroup_lines(col, tol_y, para_gap):
                para_texts.append(" ".join(b.text for b in para).strip())
    text = "\n".join(para_texts)
    return text, spans, len(kept), len(dropped)


def extract_pdf_payload(raw: str, cfg: ExtractConfig = DEFAULT_EXTRACT,
                        ) -> tuple[str, list[dict], int, int]:
    """Full per-turn layout pipeline for an embedded document payload.

    Returns (text_extracted, spans, blocks_kept, blocks_dropped_dup).
    Extracted text = body paragraphs in reading order (left column before
    right on two-column pages), lines joined by a space within a
    paragraph, paragraphs joined by newline.  Header/footer blocks are
    span-tagged but excluded from the text (strip-but-account).  A
    low-yield first pass triggers the rescue tier (see module docstring).
    """
    kept_raw, low, pages = parse_payload(raw, cfg.min_conf)
    text, spans, kept_n, dropped_n = _layout_pass(kept_raw, pages, cfg)
    rescued: list[Block] = []
    if len(text) < cfg.rescue_min_chars:
        rescued = [b for b in low if b.conf >= cfg.rescue_conf]
        if rescued:
            text, spans, kept_n, dropped_n = _layout_pass(
                kept_raw + rescued, pages, cfg,
                rescued_ids=frozenset(id(b) for b in rescued))
    resc = frozenset(id(b) for b in rescued)
    for b in low:
        if id(b) not in resc:
            spans.append({"start": b.span_start, "end": b.span_end,
                          "kind": "lowconf"})
    spans.sort(key=lambda d: (d["start"], d["end"], d["kind"]))
    return text, spans, kept_n, dropped_n
