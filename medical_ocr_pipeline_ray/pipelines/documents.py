"""Schema-document assembly: per-conversation nested domain documents.

The reference's end product is a nested schema document (struct fields
``patient``/``doctor``, list-of-struct ``medications``, plain ``tests``
list — config/schema_prescription.json:1-43) assembled by a recursive
``merge_dict`` fold over per-chunk extractions
(notebooks/04_json_extraction.ipynb:~89;
notebooks/05_merge_and_validate.ipynb:~52).  This operator reproduces that
end-to-end shape on Ray Data:

1. per-turn partial extraction (``extract_doc_fields`` — deterministic
   rule extractor replacing the LLM stage) inside ``map_batches``; turns
   contributing nothing are dropped immediately, so only slim
   (bucket, salt, conv_id, turn_idx, doc_json) rows reach the shuffle;
2. bucketed two-phase fold (stages/assemble.py pattern — one task per
   COARSE bucket, conversations folded vectorized inside): per
   (bucket, salt) partial fold in turn order, then a per-bucket merge of
   salt partials in salt order.  Legal because ``merge_docs`` is
   associative over the ordered sequence (first-wins + ordered list
   union — functions/docschema.py);
3. a final typed-Arrow projection: documents materialize as
   ``pa.struct`` / ``pa.list_(pa.struct)`` columns, not JSON blobs.
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.docschema import (doc_to_json, extract_doc_fields,
                                   fold_docs, merge_docs)
from ..sources.transcripts import read_transcripts
from ..synth import tier_for_sf_dir
from .extract_pipeline import build_turns_pipeline

_BUCKETS = 64
_SALT_SPAN = 512

PATIENT_T = pa.struct([("name", pa.string()), ("age", pa.string())])
DOCTOR_T = pa.struct([("name", pa.string())])
MED_T = pa.struct([("drug", pa.string()), ("strength", pa.string()),
                   ("frequency", pa.string())])
DOC_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_sources", pa.int64()),
    ("patient", PATIENT_T),
    ("doctor", DOCTOR_T),
    ("medications", pa.list_(MED_T)),
    ("tests", pa.list_(pa.string())),
])


def _partials_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-turn field extraction; emits only contributing turns."""
    bks, salts, convs, turns, docs = [], [], [], [], []
    for conv, tix, text in zip(df["conv_id"], df["turn_idx"],
                               df["text_extracted"]):
        d = extract_doc_fields(text or "")
        if not d:
            continue
        bks.append(zlib.crc32(conv.encode()) % _BUCKETS)
        salts.append(int(tix) // _SALT_SPAN)
        convs.append(conv)
        turns.append(int(tix))
        docs.append(doc_to_json(d))
    return pd.DataFrame({
        "bucket": np.array(bks, dtype=np.int32),
        "salt": np.array(salts, dtype=np.int32),
        "conv_id": convs,
        "turn_idx": np.array(turns, dtype=np.int32),
        "doc_json": docs})


def _runs(keys: np.ndarray):
    n = len(keys)
    if n == 0:
        return []
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return list(zip(starts, ends))


def _fold_salt_group(g: pd.DataFrame) -> pd.DataFrame:
    """One partial doc per (conv, salt), folded in turn order — vectorized
    run detection over the whole bucket (never one Ray group per conv)."""
    g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    conv = g["conv_id"].to_numpy()
    docs = g["doc_json"].to_numpy()
    oc, on, od = [], [], []
    for s, e in _runs(conv):
        folded = fold_docs([json.loads(x) for x in docs[s:e]])
        oc.append(conv[s])
        on.append(int(e - s))
        od.append(doc_to_json(folded))
    return pd.DataFrame({
        "bucket": np.full(len(oc), int(g["bucket"].iloc[0]), dtype=np.int32),
        "conv_id": oc,
        "salt": np.full(len(oc), int(g["salt"].iloc[0]), dtype=np.int32),
        "n_sources": np.array(on, dtype=np.int64),
        "doc_json": od})


def _fold_final_group(g: pd.DataFrame) -> pd.DataFrame:
    """Merge each conversation's salt partials in salt order."""
    g = g.sort_values(["conv_id", "salt"], kind="mergesort")
    conv = g["conv_id"].to_numpy()
    docs = g["doc_json"].to_numpy()
    ns = g["n_sources"].to_numpy()
    oc, on, od = [], [], []
    for s, e in _runs(conv):
        doc = json.loads(docs[s])
        for x in docs[s + 1:e]:
            doc = merge_docs(doc, json.loads(x))
        oc.append(conv[s])
        on.append(int(ns[s:e].sum()))
        od.append(doc_to_json(doc))
    return pd.DataFrame({"conv_id": oc,
                         "n_sources": np.array(on, dtype=np.int64),
                         "doc_json": od})


def _to_arrow(df: pd.DataFrame) -> pa.Table:
    docs = [json.loads(s) for s in df["doc_json"]]
    return pa.table({
        "conv_id": pa.array(list(df["conv_id"]), pa.string()),
        "n_sources": pa.array(list(df["n_sources"].astype(int)), pa.int64()),
        "patient": pa.array([d["patient"] for d in docs], PATIENT_T),
        "doctor": pa.array([d["doctor"] for d in docs], DOCTOR_T),
        "medications": pa.array([d["medications"] for d in docs],
                                pa.list_(MED_T)),
        "tests": pa.array([d["tests"] for d in docs],
                          pa.list_(pa.string()))})


def assemble_documents_from_turns(turns_ds):
    """turns Dataset → one nested document row per contributing
    conversation (DOC_SCHEMA)."""
    partials = turns_ds.map_batches(_partials_batch, batch_format="pandas")
    per_salt = partials.groupby(["bucket", "salt"]).map_groups(
        _fold_salt_group, batch_format="pandas")
    folded = per_salt.groupby("bucket").map_groups(
        _fold_final_group, batch_format="pandas")
    return folded.map_batches(_to_arrow, batch_format="pandas")


def assemble_documents(sf_dir: str):
    turns = build_turns_pipeline(read_transcripts(tier_for_sf_dir(sf_dir)))
    return assemble_documents_from_turns(turns)


def oracle_assemble_documents(rows: list[dict]) -> pd.DataFrame:
    """Single-process sequential fold (no Ray, no salting) — ground truth
    for the associativity/parity tests.  ``rows`` are raw transcript rows;
    extraction runs through the SAME extract_turn path."""
    from ..functions.extract import extract_turn

    by_conv: dict[str, list[tuple[int, dict]]] = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        ex = extract_turn(r["text"], r.get("tool", ""))
        d = extract_doc_fields(ex.text_extracted)
        if d:
            by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], d))
    recs = []
    for conv in sorted(by_conv):
        parts = [d for _, d in sorted(by_conv[conv], key=lambda t: t[0])]
        recs.append({"conv_id": conv, "n_sources": len(parts),
                     "doc_json": doc_to_json(fold_docs(parts))})
    return pd.DataFrame(recs)


def assemble_documents_oracled(sf_dir: str):
    """The document-assembly fold as a driver-oracled row: the full Ray
    pipeline (per-turn extraction → salted two-phase merge fold) over
    the pinned tier, compared as canonical JSON against the sequential
    fold exported by turn_oracle — a green row IS the merge fold's
    associativity claim (the nested-Arrow projection is exercised by
    ``assemble_documents``/pytest; JSON is the comparable face)."""
    from ..sources.transcripts import read_transcripts
    from .turn_oracle import ORACLE_TIER, ensure_export

    ensure_export()
    turns = build_turns_pipeline(read_transcripts(ORACLE_TIER))
    partials = turns.map_batches(_partials_batch, batch_format="pandas")
    per_salt = partials.groupby(["bucket", "salt"]).map_groups(
        _fold_salt_group, batch_format="pandas")
    return per_salt.groupby("bucket").map_groups(
        _fold_final_group, batch_format="pandas")


def assemble_documents_sql() -> str:
    from .turn_oracle import documents_parquet
    return f"""
SELECT conv_id, n_sources, doc_json
FROM read_parquet('{documents_parquet()}')
"""
