"""Conversation assembly: the one mandatory shuffle, salted for skew.

``groupby(conv_id)`` with salted keys (SURVEY.md §7.4): a mega-conversation
(FIXTURES F2 — one conversation holding 30-50% of all rows) must not land in
a single ``map_groups`` task, so assembly runs in two phases:

1. salt = ``turn_idx // salt_span`` → ``groupby([conv_id, salt])`` →
   per-salt partial: turns sorted by ``turn_idx``, texts joined by newline.
2. ``groupby(conv_id)`` over the (tiny) partials → ordered merge by salt →
   conversation record with sha256 digest.

The two-phase merge is exact because ordered concatenation over contiguous
disjoint turn ranges is associative — the same property that makes the
reference's recursive ``merge_dict`` fold legal
(notebooks/05_merge_and_validate.ipynb:~52, SURVEY.md D3).

Phase-2 group size is ``n_turns / salt_span`` rows per conversation —
bounded regardless of conversation size, so no task OOMs at 10^12-turn
scale.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_PIPELINE, PipelineConfig

CONV_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_turns", pa.int64()),
    ("content_chars", pa.int64()),
    ("full_text", pa.string()),
    ("sha256", pa.string()),
])


def add_salt(batch: pa.Table, salt_span: int) -> pa.Table:
    salt = pc.cast(pc.floor(pc.divide(
        pc.cast(batch["turn_idx"], pa.float64()), float(salt_span))),
        pa.int32())
    if "salt" in batch.column_names:
        batch = batch.drop_columns(["salt"])
    return batch.append_column("salt", salt)


def partial_fold(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("turn_idx")
    return pd.DataFrame([{
        "conv_id": g["conv_id"].iloc[0],
        "salt": int(g["salt"].iloc[0]),
        "n_turns": int(len(g)),
        "content_chars": int(g["content_chars"].sum()),
        "text_part": "\n".join(g["text_extracted"].fillna("")),
    }])


def final_fold(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("salt")
    full = "\n".join(g["text_part"])
    return pd.DataFrame([{
        "conv_id": g["conv_id"].iloc[0],
        "n_turns": int(g["n_turns"].sum()),
        "content_chars": int(g["content_chars"].sum()),
        "full_text": full,
        "sha256": hashlib.sha256(full.encode("utf-8")).hexdigest(),
    }])


def assemble_conversations(turns_ds, pcfg: PipelineConfig = DEFAULT_PIPELINE):
    """turns Dataset (TURN_SCHEMA cols incl. conv_id/turn_idx/
    text_extracted/content_chars) → conversation Dataset (CONV_SCHEMA)."""
    salted = turns_ds.map_batches(
        add_salt, batch_format="pyarrow",
        fn_kwargs={"salt_span": pcfg.salt_span})
    # only the columns the fold needs ride through the exchange
    salted = salted.select_columns(
        ["conv_id", "salt", "turn_idx", "text_extracted", "content_chars"])
    partials = salted.groupby(["conv_id", "salt"]).map_groups(
        partial_fold, batch_format="pandas")
    return partials.groupby("conv_id").map_groups(
        final_fold, batch_format="pandas")
