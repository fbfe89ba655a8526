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
    """Per-segment rows over the extracted turns.  ORACLED: pinned to the
    fixed mini tier (turn_oracle.ORACLE_TIER) so the static SQL oracle —
    which re-derives the segmentation from the exported turns view with
    line splitting + heading windows — sees the identical corpus at every
    sf the driver runs.  The Ray side recomputes extraction from raw
    transcripts while the export comes from the sequential python oracle,
    so a driver-green row is ALSO an extraction-parity check."""
    from .turn_oracle import ORACLE_TIER, ensure_export
    ensure_export()
    turns = build_turns_pipeline(read_transcripts(ORACLE_TIER))
    return turns.map_batches(segment_batch, batch_format="pyarrow")


def annotate_turn_entities(sf_dir: str):
    """Entity annotations over the extracted turns (reference M10
    scispacy/quickumls annotate — deterministic analogue, text never
    mutated): one row per entity occurrence with span offsets into
    text_extracted.  Stateless batch map; swap functions/entities._match
    for a model inside an actor pool when real NER is available.
    ORACLED over the exported turns view (pinned tier — see
    ``segment_turns``): the SQL recomputes every span position with an
    anchored-regex scan + word-boundary checks."""
    import numpy as np
    import pandas as pd

    from ..functions.entities import annotate_entities
    from ..sources.transcripts import read_transcripts
    from .extract_pipeline import build_turns_pipeline
    from .turn_oracle import ORACLE_TIER, ensure_export

    ensure_export()
    turns = build_turns_pipeline(read_transcripts(ORACLE_TIER))

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


def _turns_pq() -> str:
    from .turn_oracle import turns_parquet
    return turns_parquet()


# Exact oracle for ``annotate_turn_entities``: every candidate start
# position is scanned with an ANCHORED regex on the suffix (RE2 has no
# match-position API, so positions come from the generate_series scan),
# with the Python patterns' \b boundaries mirrored as explicit
# char-class checks on the neighbours.  (?i) mirrors re.IGNORECASE on
# the drug/test lexicons; the dose pattern is case-sensitive like the
# Python one.  ent_start/ent_end are 0-based like re.Match.start/end.
def _annotate_sql() -> str:
    return f"""
WITH turns AS (
  SELECT conv_id, turn_idx, text_extracted AS t
  FROM read_parquet('{_turns_pq()}') WHERE length(text_extracted) > 0),
pos AS (
  SELECT conv_id, turn_idx, t,
         unnest(generate_series(1, length(t))) AS i
  FROM turns),
cand AS (
  SELECT conv_id, turn_idx, t, i, 'drug' AS ent_kind,
         regexp_extract(substr(t, i),
           '^(?i)(amoxicillin|ibuprofen|metformin|lisinopril|omeprazole|atorvastatin)',
           1) AS m
  FROM pos
  UNION ALL
  SELECT conv_id, turn_idx, t, i, 'dose',
         regexp_extract(substr(t, i), '^([0-9]+[ \\t\\n\\r\\f\\v]*mg)', 1)
  FROM pos
  UNION ALL
  SELECT conv_id, turn_idx, t, i, 'test',
         regexp_extract(substr(t, i),
           '^(?i)(blood[ \\t\\n\\r\\f\\v]+count|lipid[ \\t\\n\\r\\f\\v]+panel|chest[ \\t\\n\\r\\f\\v]+imaging|glucose[ \\t\\n\\r\\f\\v]+test|thyroid[ \\t\\n\\r\\f\\v]+panel)',
           1) AS m
  FROM pos)
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
       CAST(i - 1 AS INT) AS ent_start,
       CAST(i - 1 + length(m) AS INT) AS ent_end,
       m AS ent_text, ent_kind
FROM cand
WHERE m <> ''
  AND (i = 1 OR NOT regexp_matches(substr(t, i - 1, 1), '[A-Za-z0-9_]'))
  AND NOT regexp_matches(substr(t, i + length(m), 1), '[A-Za-z0-9_]')
"""


# Exact oracle for ``segment_turns``: markdown turns re-segmented from
# the exported text (heading = HEAD_RX or ALLCAPS rule, body lines
# grouped under a running heading counter, blank lines span-less exactly
# like markdown_seg); non-markdown turns are one untitled body segment.
# trim charsets use e'' escape strings — a plain SQL string would strip
# the LITERAL characters backslash/t/r/f/v.
def _segment_sql() -> str:
    ws = "e' \\t\\r\\f\\v'"
    return f"""
WITH turns AS (
  SELECT conv_id, turn_idx, payload_class, text_extracted AS t
  FROM read_parquet('{_turns_pq()}')),
md AS (
  SELECT conv_id, turn_idx, t,
         unnest(string_split(t, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(t, chr(10))))) AS ln
  FROM turns WHERE payload_class = 'markdown'),
nb AS (
  SELECT conv_id, turn_idx, line, ln,
         CASE WHEN regexp_matches(line,
                     '^#{{1,6}}[ \\t\\n\\r\\f\\v]+[^ \\t\\n\\r\\f\\v]')
                   OR regexp_matches(trim(line, {ws}),
                                     '^[A-Z][A-Z0-9 \\-:]{{3,40}}$')
              THEN 1 ELSE 0 END AS h
  FROM md WHERE regexp_matches(line, '[^ \\t\\r\\f\\v]')),
segd AS (
  SELECT *, sum(h) OVER (PARTITION BY conv_id, turn_idx
                         ORDER BY ln) AS seg_id
  FROM nb),
grp AS (
  SELECT conv_id, turn_idx, seg_id,
         coalesce(max(CASE WHEN h = 1
             THEN trim(ltrim(line, '#'), {ws}) END), '') AS title,
         coalesce(string_agg(CASE WHEN h = 0 THEN line END, chr(10)
                             ORDER BY ln), '') AS seg_text,
         count(CASE WHEN h = 0 THEN 1 END) AS n_body
  FROM segd GROUP BY conv_id, turn_idx, seg_id),
md_out AS (
  SELECT conv_id, turn_idx,
         CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY seg_id) - 1 AS INT) AS seg_idx,
         title, seg_text, CAST(n_body AS INT) AS n_lines
  FROM grp WHERE n_body > 0 OR title <> ''),
plain_out AS (
  SELECT conv_id, turn_idx, CAST(0 AS INT) AS seg_idx, '' AS title,
         t AS seg_text,
         CAST(length(t) - length(replace(t, chr(10), '')) + 1 AS INT)
           AS n_lines
  FROM turns WHERE payload_class <> 'markdown' AND length(t) > 0)
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx, seg_idx, title,
       seg_text, n_lines
FROM md_out UNION ALL SELECT * FROM plain_out
"""
