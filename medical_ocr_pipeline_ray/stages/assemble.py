"""Conversation assembly: bucketed two-phase fold (the one shuffle family).

Ray's ``groupby(key).map_groups(fn)`` pays ~1.5 ms of framework overhead
PER GROUP — catastrophic at 10^5-10^9 conversations (measured 100× slower
than a vectorized fold).  Assembly therefore never creates one group per
conversation; it groups by a COARSE key and folds all conversations of a
bucket vectorized inside one task:

1. key phase (``map_batches``): ``bucket = crc32(conv_id) % P`` and
   ``salt = turn_idx // S``.
2. partial fold: ``groupby([bucket, salt])`` → per GROUP (not per conv):
   sort by (conv_id, turn_idx), detect conversation runs with numpy
   boundary diffs, join texts per run → one partial row per (conv, salt).
   Group size ≈ corpus/P, bounded by choosing P ~ corpus_bytes/256 MB; a
   mega-conversation (FIXTURES F2) is split across salts, so no group
   explodes (the reference-analogue associative-merge argument:
   notebooks/05_merge_and_validate.ipynb:~52 ``merge_dict`` fold /
   SURVEY.md D3).
3. final fold: ``groupby(bucket)`` over the (tiny) partials → sort by
   (conv_id, salt), run-fold again, sha256 per conversation.

Both shuffles move only slim columns (raw payloads were dropped at the
extraction stage); group counts are O(P), so map_groups overhead is
negligible; all per-row work is a single python scan per bucket.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_PIPELINE, PipelineConfig

CONV_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_turns", pa.int64()),
    ("content_chars", pa.int64()),
    ("full_text", pa.string()),
    ("sha256", pa.string()),
])


def _add_keys(batch: pa.Table, buckets: int, salt_span: int) -> pa.Table:
    conv = batch["conv_id"].to_pylist()
    bucket = np.fromiter((zlib.crc32(c.encode()) % buckets for c in conv),
                         dtype=np.int32, count=len(conv))
    salt = (batch["turn_idx"].to_numpy(zero_copy_only=False) //
            salt_span).astype(np.int32)
    out = batch
    for name, arr in (("bucket", bucket), ("salt", salt)):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, pa.array(arr))
    return out


def _runs(conv_sorted: np.ndarray) -> list[tuple[int, int]]:
    """Contiguous [start, end) runs of equal conv_id in a sorted array."""
    n = len(conv_sorted)
    if n == 0:
        return []
    change = np.flatnonzero(conv_sorted[1:] != conv_sorted[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return list(zip(starts, ends))


def partial_fold_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One partial row per (conv, salt) — vectorized over the whole bucket."""
    g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    conv = g["conv_id"].to_numpy()
    texts = g["text_extracted"].to_numpy()
    chars = g["content_chars"].to_numpy()
    salts = g["salt"].to_numpy()
    # runs keyed by (conv, salt): conv runs then split on salt changes
    key = np.char.add(conv.astype(str),
                      np.char.add("\x00", salts.astype(str)))
    oc, osalt, on, ochars, otext = [], [], [], [], []
    for s, e in _runs(key):
        oc.append(conv[s])
        osalt.append(int(salts[s]))
        on.append(int(e - s))
        ochars.append(int(chars[s:e].sum()))
        otext.append("\n".join(t if t is not None else ""
                               for t in texts[s:e]))
    return pd.DataFrame({
        "bucket": np.full(len(oc), int(group["bucket"].iloc[0]),
                          dtype=np.int32),
        "conv_id": oc,
        "salt": np.array(osalt, dtype=np.int32),
        "n_turns": np.array(on, dtype=np.int64),
        "content_chars": np.array(ochars, dtype=np.int64),
        "text_part": otext,
    })


def final_fold_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """Merge each conversation's salt partials (ordered) — vectorized over
    the whole bucket; one output row per conversation."""
    g = group.sort_values(["conv_id", "salt"], kind="mergesort")
    conv = g["conv_id"].to_numpy()
    parts = g["text_part"].to_numpy()
    n_turns = g["n_turns"].to_numpy()
    chars = g["content_chars"].to_numpy()
    oc, on, ochars, otext, osha = [], [], [], [], []
    for s, e in _runs(conv):
        full = "\n".join(parts[s:e])
        oc.append(conv[s])
        on.append(int(n_turns[s:e].sum()))
        ochars.append(int(chars[s:e].sum()))
        otext.append(full)
        osha.append(hashlib.sha256(full.encode("utf-8")).hexdigest())
    return pd.DataFrame({
        "conv_id": oc,
        "n_turns": np.array(on, dtype=np.int64),
        "content_chars": np.array(ochars, dtype=np.int64),
        "full_text": otext,
        "sha256": osha,
    })


def assemble_conversations(turns_ds, pcfg: PipelineConfig = DEFAULT_PIPELINE):
    """turns Dataset (conv_id/turn_idx/text_extracted/content_chars …) →
    conversation Dataset (CONV_SCHEMA).  Pure two-shuffle dataset pipeline
    (no writes); the checkpointing runner uses the cheaper staged
    single-shuffle variant (``fold_or_finalize`` + a side merge of the rare
    multi-salt partials, see pipelines/extract_pipeline.run_assembly)."""
    slim = turns_ds.select_columns(
        ["conv_id", "turn_idx", "text_extracted", "content_chars"])
    keyed = slim.map_batches(
        _add_keys, batch_format="pyarrow", batch_size=pcfg.batch_size,
        fn_kwargs={"buckets": pcfg.assembly_buckets,
                   "salt_span": pcfg.salt_span})
    partials = keyed.groupby(["bucket", "salt"]).map_groups(
        partial_fold_bucket, batch_format="pandas")
    return partials.groupby("bucket").map_groups(
        final_fold_bucket, batch_format="pandas")


def fold_or_finalize(group: pd.DataFrame, salt_span: int) -> pd.DataFrame:
    """Phase-A fold that FINALIZES complete conversations in place.

    A conversation is provably complete inside its (bucket, salt=0) group
    when its max turn_idx < salt_span - 1 (turn indices are contiguous
    0..n-1 per conversation — FIXTURES.md F1; convs with >= salt_span
    turns conservatively take the partial path).  Finalized rows carry
    sha256 + is_final=True; multi-salt conversations emit partial rows
    (is_final=False) that a tiny follow-up shuffle merges — so the bulk of
    the corpus never rides a second exchange."""
    g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    conv = g["conv_id"].to_numpy()
    turn = g["turn_idx"].to_numpy()
    texts = g["text_extracted"].to_numpy()
    chars = g["content_chars"].to_numpy()
    salt0 = int(g["salt"].iloc[0]) == 0
    oc, on, ochars, otext, osha, ofinal, omin = [], [], [], [], [], [], []
    for s, e in _runs(conv):
        full = "\n".join(t if t is not None else "" for t in texts[s:e])
        complete = salt0 and int(turn[e - 1]) < salt_span - 1
        oc.append(conv[s])
        on.append(int(e - s))
        ochars.append(int(chars[s:e].sum()))
        otext.append(full)
        osha.append(hashlib.sha256(full.encode("utf-8")).hexdigest()
                    if complete else "")
        ofinal.append(complete)
        omin.append(int(turn[s]))
    return pd.DataFrame({
        "conv_id": oc,
        "n_turns": np.array(on, dtype=np.int64),
        "content_chars": np.array(ochars, dtype=np.int64),
        "full_text": otext,
        "sha256": osha,
        "is_final": np.array(ofinal, dtype=bool),
        "min_turn": np.array(omin, dtype=np.int32),
    })


def merge_partials(group: pd.DataFrame) -> pd.DataFrame:
    """Merge one conversation's multi-salt partials (few rows per conv)."""
    g = group.sort_values("min_turn")
    full = "\n".join(g["full_text"])
    return pd.DataFrame([{
        "conv_id": g["conv_id"].iloc[0],
        "n_turns": int(g["n_turns"].sum()),
        "content_chars": int(g["content_chars"].sum()),
        "full_text": full,
        "sha256": hashlib.sha256(full.encode("utf-8")).hexdigest(),
    }])
