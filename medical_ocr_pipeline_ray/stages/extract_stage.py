"""Ray Data extraction stages: cheap stateless pass + heavy actor pool.

Two-tier escalation (the reference's adaptive fast/heavy policy,
``need_escalation`` + grid rescue, notebooks/01_extract_blocks.ipynb:~25,~88,
SURVEY.md L7), re-expressed as in-batch routing so the dataset is scanned
once and never forked:

1. ``extract_cheap_batch`` — stateless ``map_batches`` fn
   (batch_format="pyarrow"): classifies every turn and fully extracts the
   cheap classes (plain / html / markdown / empty); heavy classes
   (tool_pdf_payload, ocr_noisy) are flagged ``needs_heavy`` and passed
   through untouched.
2. ``HeavyExtractor`` — callable CLASS for an actor pool
   (``map_batches(HeavyExtractor, concurrency=N, batch_size=B)``): the
   correction dictionary regex / fuzzy vocab / difflib cache are built and
   warmed ONCE per actor in ``__init__`` (the reference's lazy model
   singletons A1-A10 and warmup protocol A12, SURVEY.md §2.3); ``__call__``
   extracts only the flagged rows and passes the rest through.

Output schema per turn (fixed, declared — the reference's accreting dynamic
schema is deliberately not ported, SURVEY.md §1.5):
conv_id, turn_idx, role, payload_class, text_extracted, spans
(list<struct<start,end,kind>>), blocks_kept, blocks_dropped_dup,
content_chars, needs_heavy.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_EXTRACT, ExtractConfig
from ..functions.classify import HEAVY_CLASSES, classify_turn
from ..functions.extract import extract_turn

SPAN_TYPE = pa.list_(pa.struct([
    ("start", pa.int32()), ("end", pa.int32()), ("kind", pa.string()),
]))

TURN_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("payload_class", pa.string()),
    ("text_extracted", pa.string()),
    ("spans", SPAN_TYPE),
    ("blocks_kept", pa.int32()),
    ("blocks_dropped_dup", pa.int32()),
    ("content_chars", pa.int32()),
])


def _result_arrays(texts: list[str], tools: list[str],
                   cfg: ExtractConfig,
                   classes: list[str] | None = None) -> dict[str, list]:
    """Row loop for string parsing (no Arrow kernel exists for tokenization;
    the loop is the per-turn extraction itself, not incidental overhead).
    ``classes`` carries pre-computed payload classes from the vectorized
    classifier so classification isn't repeated per row."""
    n = len(texts)
    out = {
        "payload_class": [""] * n,
        "text_extracted": [""] * n,
        "spans": [None] * n,
        "blocks_kept": [0] * n,
        "blocks_dropped_dup": [0] * n,
        "content_chars": [0] * n,
        "needs_heavy": [False] * n,
    }
    for i in range(n):
        text = texts[i] or ""
        cls = classes[i] if classes is not None else \
            classify_turn(text, tools[i] or "")
        out["payload_class"][i] = cls
        if cls in HEAVY_CLASSES:
            out["needs_heavy"][i] = True
            out["spans"][i] = []
            continue
        try:
            ex = extract_turn(text, tools[i] or "", cfg, cls=cls)
        except Exception:
            # poison-row quarantine (reference: try/except-continue per
            # block, e.g. 04_json_extraction.ipynb — SURVEY §4.2 dead
            # letter): the row survives with class 'error' instead of
            # killing the partition
            out["payload_class"][i] = "error"
            out["spans"][i] = []
            continue
        out["text_extracted"][i] = ex.text_extracted
        out["spans"][i] = ex.spans
        out["blocks_kept"][i] = ex.blocks_kept
        out["blocks_dropped_dup"][i] = ex.blocks_dropped_dup
        out["content_chars"][i] = len(ex.text_extracted)
    return out


def _append_extract_cols(batch: pa.Table, res: dict[str, list]) -> pa.Table:
    cols = {
        "payload_class": pa.array(res["payload_class"], pa.string()),
        "text_extracted": pa.array(res["text_extracted"], pa.string()),
        "spans": pa.array(res["spans"], SPAN_TYPE),
        "blocks_kept": pa.array(res["blocks_kept"], pa.int32()),
        "blocks_dropped_dup": pa.array(res["blocks_dropped_dup"], pa.int32()),
        "content_chars": pa.array(res["content_chars"], pa.int32()),
        "needs_heavy": pa.array(res["needs_heavy"], pa.bool_()),
    }
    for name, arr in cols.items():
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, arr)
    return batch


def _np(arr) -> "np.ndarray":
    import numpy as np
    return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=bool)


def _classify_vectorized(batch: pa.Table) -> tuple:
    """Vectorized (RE2/C++) payload classification for a whole batch.

    Returns numpy masks (empty, pdf, html, md, noisy, plain) — same
    semantics as functions/classify.classify_turn (oracle-parity tests
    enforce the equivalence)."""
    import numpy as np
    import pyarrow.compute as pcc

    from ..functions.classify import (HTML_PATTERN_RE2, MD_PATTERN_RE2,
                                      NOISY_LITERALS, NOISY_PATTERNS_RE2)
    from ..functions.pdfblocks import MAGIC

    text = pcc.fill_null(batch["text"], "")
    n = batch.num_rows
    if "tool" in batch.column_names:
        has_tool = _np(pcc.not_equal(pcc.fill_null(batch["tool"], ""), ""))
    else:
        has_tool = np.zeros(n, dtype=bool)
    empty = _np(pcc.equal(pcc.utf8_trim_whitespace(text), ""))
    pdf = ~empty & has_tool & _np(pcc.starts_with(text, pattern=MAGIC))
    rest = ~(empty | pdf)
    html = rest & _np(pcc.match_substring_regex(text,
                                                pattern=HTML_PATTERN_RE2))
    rest &= ~html
    md = rest & _np(pcc.match_substring_regex(text, pattern=MD_PATTERN_RE2))
    rest &= ~md
    noisy_any = np.zeros(n, dtype=bool)
    for lit in NOISY_LITERALS:
        noisy_any |= _np(pcc.match_substring(text, pattern=lit))
    for pat in NOISY_PATTERNS_RE2:
        noisy_any |= _np(pcc.match_substring_regex(text, pattern=pat))
    noisy = rest & noisy_any
    plain = rest & ~noisy
    return empty, pdf, html, md, noisy, plain


def _fast_subtable(ft: pa.Table, f_empty) -> pa.Table:
    """Vectorized plain/empty rows: identity extraction, single main span,
    all columns built in Arrow — no per-row Python."""
    import numpy as np
    import pyarrow.compute as pcc

    text = pcc.fill_null(ft["text"], "")
    lens = np.asarray(pcc.utf8_length(text).to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    lens = np.where(f_empty, 0, lens)
    te = pcc.if_else(pa.array(f_empty), pa.scalar("", pa.string()), text)
    span_count = np.where(f_empty, 0, 1).astype(np.int32)
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(span_count, out=offsets[1:])
    span_lens = lens[~f_empty].astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [pa.array(np.zeros(len(span_lens), dtype=np.int32)),
         pa.array(span_lens),
         pa.array(["main"] * len(span_lens), pa.string())],
        names=["start", "end", "kind"])
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    classes = np.where(f_empty, "empty", "plain")
    out = ft
    cols = {
        "payload_class": pa.array(classes, pa.string()),
        "text_extracted": te,
        "spans": spans.cast(SPAN_TYPE),
        "blocks_kept": pa.array(span_count, pa.int32()),
        "blocks_dropped_dup": pa.array(
            np.zeros(len(lens), dtype=np.int32)),
        "content_chars": pa.array(lens.astype(np.int32)),
        "needs_heavy": pa.array(np.zeros(len(lens), dtype=bool)),
    }
    for name, arr in cols.items():
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, arr)
    return out


def extract_cheap_batch(batch: pa.Table,
                        cfg: ExtractConfig = DEFAULT_EXTRACT) -> pa.Table:
    """Cheap-tier extraction: vectorized classification; plain/empty rows
    fully in Arrow; html/markdown rows extracted in Python; heavy classes
    flagged for the heavy tier."""
    import numpy as np
    if batch.num_rows == 0:
        return _append_extract_cols(batch, _result_arrays([], [], cfg))
    empty, pdf, html, md, noisy, plain = _classify_vectorized(batch)
    fast = empty | plain
    if fast.all():
        return _fast_subtable(batch, empty)
    slow_idx = np.flatnonzero(~fast)
    st = batch.take(slow_idx)
    texts = st["text"].to_pylist()
    tools = st["tool"].to_pylist() if "tool" in st.column_names \
        else [""] * len(texts)
    cls_np = np.select([pdf, html, md, noisy],
                       ["tool_pdf_payload", "html", "markdown", "ocr_noisy"],
                       default="plain")[slow_idx]
    slow_out = _append_extract_cols(
        st, _result_arrays(texts, tools, cfg, classes=list(cls_np)))
    if fast.any():
        fast_out = _fast_subtable(batch.take(np.flatnonzero(fast)),
                                  empty[fast])
        return pa.concat_tables([fast_out, slow_out],
                                promote_options="default")
    return slow_out


class HeavyExtractor:
    """Actor-pool stage for the expensive classes.

    ``__init__`` builds per-actor state once: importing the correction
    module compiles the combined dictionary regex and fuzzy vocab, and a
    warmup call primes the difflib cache (reference warmup protocol,
    mcp/mcp_ocr_tesseract.py:89-117 → actor ``__init__`` per SURVEY A12).
    """

    def __init__(self, cfg: ExtractConfig = DEFAULT_EXTRACT,
                 keep_cols: tuple[str, ...] = ()):
        self.cfg = cfg
        self.keep = list(TURN_SCHEMA.names) + list(keep_cols)
        from ..functions.ocr_correct import correct_text
        correct_text("warmup necrosls examinaton 10 mg")  # prime caches

    def _project(self, batch: pa.Table) -> pa.Table:
        """Final projection done HERE (not a separate operator): drops the
        raw text/payload columns before any shuffle (wide tool payloads must
        not ride the assembly exchange — SURVEY.md §7.5) and avoids an extra
        object-store hop for every batch."""
        return batch.select([n for n in self.keep
                             if n in batch.column_names])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        mask = batch["needs_heavy"].to_numpy(zero_copy_only=False)
        if not mask.any():
            return self._project(batch)
        # splice: re-materialize ONLY the flagged rows; cheap rows pass
        # through as zero-copy takes.  Row order within the batch changes —
        # all consumers are order-insensitive (assembly re-sorts).
        cheap = self._project(batch.take(np.flatnonzero(~mask)))
        hb = batch.take(np.flatnonzero(mask))
        texts = hb["text"].to_pylist()
        tools = hb["tool"].to_pylist() if "tool" in hb.column_names \
            else [""] * len(texts)
        klass = hb["payload_class"].to_pylist()
        res: dict[str, list] = {
            "payload_class": [], "text_extracted": [], "spans": [],
            "blocks_kept": [], "blocks_dropped_dup": [], "content_chars": [],
            "needs_heavy": [False] * len(texts)}
        for text, tool, kls in zip(texts, tools, klass):
            try:
                ex = extract_turn(text or "", tool or "", self.cfg,
                                  cls=kls or None)
            except Exception:
                # poison-row quarantine (SURVEY §4.2) — see _result_arrays
                res["payload_class"].append("error")
                res["text_extracted"].append("")
                res["spans"].append([])
                res["blocks_kept"].append(0)
                res["blocks_dropped_dup"].append(0)
                res["content_chars"].append(0)
                continue
            res["payload_class"].append(ex.payload_class)
            res["text_extracted"].append(ex.text_extracted)
            res["spans"].append(ex.spans)
            res["blocks_kept"].append(ex.blocks_kept)
            res["blocks_dropped_dup"].append(ex.blocks_dropped_dup)
            res["content_chars"].append(len(ex.text_extracted))
        heavy = self._project(_append_extract_cols(hb, res))
        return pa.concat_tables([cheap, heavy], promote_options="default")


# --- task-based variant with process-cached state ---------------------------
# Measured on this workload: an elastic task pool outruns a bounded actor
# pool by ~40% (the correction state here is just compiled regexes + a
# difflib cache, cheap to hold per worker PROCESS; Ray worker processes
# persist across tasks, so module-level caching gives actor-style state
# amortization without actor-pool dispatch overhead).  Actor pools remain
# the right pattern for heavyweight state (model weights, on-disk indexes)
# — see pipelines/multimodal.py MediaDecoder — and can be re-enabled for
# this stage with PipelineConfig(use_actor_pool=True).
_EXTRACTOR_CACHE: dict = {}


def extract_full_batch(batch: pa.Table, cfg: ExtractConfig = DEFAULT_EXTRACT,
                       keep_cols: tuple[str, ...] = ()) -> pa.Table:
    """cheap + heavy extraction in one task-pool stage (state cached per
    worker process)."""
    key = (cfg, keep_cols)   # ExtractConfig is frozen → hashable
    he = _EXTRACTOR_CACHE.get(key)
    if he is None:
        he = HeavyExtractor(cfg, keep_cols)
        _EXTRACTOR_CACHE[key] = he
    return he(extract_cheap_batch(batch, cfg))
