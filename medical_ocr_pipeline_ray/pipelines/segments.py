"""Heading-delimited segment assembly (reference stage 02a,
notebooks/02a_segment_general.ipynb:~24 ``segment_page``: heading-triggered
segment breaks, bullet-aware soft joins), re-targeted at turns.

For markdown turns the line spans produced at extraction time index into
``text_extracted`` (extraction is identity for markdown), so segmentation
is a pure per-turn batch map over the extraction output — no re-parse, no
shuffle.  Non-markdown turns yield a single untitled body segment.
Output: one row per segment (conv_id, turn_idx, seg_idx, title, seg_text,
n_lines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.transcripts import read_transcripts
from ..synth import tier_for_sf_dir
from .extract_pipeline import build_turns_pipeline


def _segment_rows(conv_id: str, turn_idx: int, text: str, spans,
                  payload_class: str) -> list[dict]:
    if payload_class != "markdown" or not spans:
        if not text:
            return []
        return [{"conv_id": conv_id, "turn_idx": turn_idx, "seg_idx": 0,
                 "title": "", "seg_text": text,
                 "n_lines": text.count("\n") + 1}]
    segs: list[dict] = []
    cur_title = ""
    cur_lines: list[str] = []

    def flush():
        if cur_lines or cur_title:
            segs.append({
                "conv_id": conv_id, "turn_idx": turn_idx,
                "seg_idx": len(segs), "title": cur_title,
                "seg_text": "\n".join(cur_lines),
                "n_lines": len(cur_lines)})

    for s in spans:
        line = text[s["start"]:s["end"]]
        if s["kind"] == "heading":
            flush()
            cur_title = line.lstrip("#").strip()
            cur_lines = []
        else:
            cur_lines.append(line)
    flush()
    return segs


def segment_batch(batch: pa.Table) -> pa.Table:
    rows: list[dict] = []
    for conv_id, turn_idx, text, spans, cls in zip(
            batch["conv_id"].to_pylist(), batch["turn_idx"].to_pylist(),
            batch["text_extracted"].to_pylist(), batch["spans"].to_pylist(),
            batch["payload_class"].to_pylist()):
        rows.extend(_segment_rows(conv_id, turn_idx, text or "", spans or [],
                                  cls))
    if not rows:
        return pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "seg_idx": pa.array([], pa.int32()),
            "title": pa.array([], pa.string()),
            "seg_text": pa.array([], pa.string()),
            "n_lines": pa.array([], pa.int32())})
    df = pd.DataFrame(rows)
    return pa.table({
        "conv_id": pa.array(df["conv_id"], pa.string()),
        "turn_idx": pa.array(df["turn_idx"].astype(np.int32)),
        "seg_idx": pa.array(df["seg_idx"].astype(np.int32)),
        "title": pa.array(df["title"], pa.string()),
        "seg_text": pa.array(df["seg_text"], pa.string()),
        "n_lines": pa.array(df["n_lines"].astype(np.int32))})


def segment_turns(sf_dir: str):
    turns = build_turns_pipeline(read_transcripts(tier_for_sf_dir(sf_dir)))
    return turns.map_batches(segment_batch, batch_format="pyarrow")


def annotate_turn_entities(sf_dir: str):
    """Entity annotations over the extracted turns (reference M10
    scispacy/quickumls annotate — deterministic analogue, text never
    mutated): one row per entity occurrence with span offsets into
    text_extracted.  Stateless batch map; swap functions/entities._match
    for a model inside an actor pool when real NER is available."""
    import numpy as np
    import pandas as pd

    from ..functions.entities import annotate_entities
    from ..sources.transcripts import read_transcripts
    from ..synth import tier_for_sf_dir
    from .extract_pipeline import build_turns_pipeline

    turns = build_turns_pipeline(read_transcripts(tier_for_sf_dir(sf_dir)))

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        convs, tix, starts, ends, texts, kinds = [], [], [], [], [], []
        for conv, t, body in zip(df["conv_id"], df["turn_idx"],
                                 df["text_extracted"]):
            for e in annotate_entities(body or ""):
                convs.append(conv)
                tix.append(int(t))
                starts.append(e["start"])
                ends.append(e["end"])
                texts.append(e["text"])
                kinds.append(e["kind"])
        return pd.DataFrame({
            "conv_id": convs,
            "turn_idx": np.array(tix, dtype=np.int32),
            "ent_start": np.array(starts, dtype=np.int32),
            "ent_end": np.array(ends, dtype=np.int32),
            "ent_text": texts,
            "ent_kind": kinds})

    return turns.map_batches(annotate, batch_format="pandas")
