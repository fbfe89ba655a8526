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
                   cfg: ExtractConfig) -> dict[str, list]:
    """Row loop for string parsing (no Arrow kernel exists for tokenization;
    the loop is the per-turn extraction itself, not incidental overhead)."""
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
        cls = classify_turn(text, tools[i] or "")
        out["payload_class"][i] = cls
        if cls in HEAVY_CLASSES:
            out["needs_heavy"][i] = True
            out["spans"][i] = []
            continue
        ex = extract_turn(text, tools[i] or "", cfg)
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


def extract_cheap_batch(batch: pa.Table,
                        cfg: ExtractConfig = DEFAULT_EXTRACT) -> pa.Table:
    texts = batch["text"].to_pylist()
    tools = batch["tool"].to_pylist() if "tool" in batch.column_names \
        else [""] * len(texts)
    return _append_extract_cols(batch, _result_arrays(texts, tools, cfg))


class HeavyExtractor:
    """Actor-pool stage for the expensive classes.

    ``__init__`` builds per-actor state once: importing the correction
    module compiles the combined dictionary regex and fuzzy vocab, and a
    warmup call primes the difflib cache (reference warmup protocol,
    mcp/mcp_ocr_tesseract.py:89-117 → actor ``__init__`` per SURVEY A12).
    """

    def __init__(self, cfg: ExtractConfig = DEFAULT_EXTRACT):
        self.cfg = cfg
        from ..functions.ocr_correct import correct_text
        correct_text("warmup necrosls examinaton 10 mg")  # prime caches

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = batch["needs_heavy"].to_pylist()
        if not any(mask):
            return batch
        texts = batch["text"].to_pylist()
        tools = batch["tool"].to_pylist() if "tool" in batch.column_names \
            else [""] * len(texts)
        pc_l = batch["payload_class"].to_pylist()
        te = batch["text_extracted"].to_pylist()
        spans = batch["spans"].to_pylist()
        bk = batch["blocks_kept"].to_pylist()
        bd = batch["blocks_dropped_dup"].to_pylist()
        cc = batch["content_chars"].to_pylist()
        for i, heavy in enumerate(mask):
            if not heavy:
                continue
            ex = extract_turn(texts[i] or "", tools[i] or "", self.cfg)
            pc_l[i] = ex.payload_class
            te[i] = ex.text_extracted
            spans[i] = ex.spans
            bk[i] = ex.blocks_kept
            bd[i] = ex.blocks_dropped_dup
            cc[i] = len(ex.text_extracted)
        return _append_extract_cols(batch, {
            "payload_class": pc_l, "text_extracted": te, "spans": spans,
            "blocks_kept": bk, "blocks_dropped_dup": bd, "content_chars": cc,
            "needs_heavy": [False] * len(mask),
        })


def finalize_turns(batch: pa.Table) -> pa.Table:
    """Project to the declared output schema, dropping the raw text/payload
    columns BEFORE any shuffle (wide tool payloads must not ride through
    the assembly exchange — SURVEY.md §7.5 'very wide rows')."""
    keep = [n for n in TURN_SCHEMA.names if n in batch.column_names]
    return batch.select(keep)
