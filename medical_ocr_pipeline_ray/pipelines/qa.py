"""QA / stage-metrics layer over the extraction pipeline.

Re-expresses the reference's QA surface (SURVEY.md §2.5, §5) as grouped
aggregates over the extraction output:

- ``qa_turn_metrics``      — per-payload-class rollup (G1/G2/G5 analogue:
  turn counts, content chars, blocks kept/dropped).
- ``qa_content_accounting`` — raw-vs-extracted char accounting per class
  (G4 stage deltas + G10 content-drop gate: boilerplate removal is the
  only sanctioned char loss, and it is span-tagged, never silent).
- ``qa_against_expected``  — CER/WER of the Ray output against the
  generator's expected sidecar (the reference's ground-truth comparison
  path, qa_pipeline_evaluator.py:444-509), aggregated corpus-wide.
  The oracle gate requires mean CER == 0.

All are partial-aggregated inside ``map_batches`` before a tiny groupby —
no corpus-sized shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import Max, Sum

from ..sources.transcripts import expected_dir, read_transcripts
from ..synth import tier_for_sf_dir
from .extract_pipeline import build_turns_pipeline


def _turns_for(sf_dir: str):
    return build_turns_pipeline(read_transcripts(tier_for_sf_dir(sf_dir)))


def qa_turn_metrics(sf_dir: str):
    turns = _turns_for(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "payload_class": df["payload_class"],
            "n_turns": np.ones(len(df), dtype=np.int64),
            "content_chars": df["content_chars"].astype(np.int64),
            "blocks_kept": df["blocks_kept"].astype(np.int64),
            "blocks_dropped_dup": df["blocks_dropped_dup"].astype(np.int64),
            "n_empty_out": (df["content_chars"] == 0).astype(np.int64),
        })
        return t.groupby("payload_class", as_index=False).sum()

    partials = turns.map_batches(partial, batch_format="pandas")
    return partials.groupby("payload_class").aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Sum("content_chars", alias_name="content_chars"),
        Sum("blocks_kept", alias_name="blocks_kept"),
        Sum("blocks_dropped_dup", alias_name="blocks_dropped_dup"),
        Sum("n_empty_out", alias_name="n_empty_out"))


def qa_content_accounting(sf_dir: str):
    """Raw chars vs extracted chars vs span-accounted chars per class —
    the content-drop gate's inputs (reference max_content_drop=0.15,
    qa_pipeline_evaluator.py:717-768; here boilerplate classes legitimately
    shrink, but tagged spans must account for the raw text)."""
    ds = read_transcripts(tier_for_sf_dir(sf_dir))
    turns = build_turns_pipeline(ds)
    # raw lengths come from the input; join-free: recompute in the same
    # pipeline by carrying text length through extraction is not possible
    # post-projection, so rebuild from the source (cheap columnar read)
    raw = ds.map_batches(
        lambda df: pd.DataFrame({
            "conv_id": df["conv_id"], "turn_idx": df["turn_idx"],
            "raw_chars": df["text"].str.len().astype(np.int64)}),
        batch_format="pandas")

    def partial_ex(df: pd.DataFrame) -> pd.DataFrame:
        spans_chars = [0 if sp is None else
                       int(sum(s["end"] - s["start"] for s in sp))
                       for sp in df["spans"]]
        t = pd.DataFrame({
            "payload_class": df["payload_class"],
            "extracted_chars": df["content_chars"].astype(np.int64),
            "span_chars": np.array(spans_chars, dtype=np.int64),
            "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby("payload_class", as_index=False).sum()

    ex = turns.map_batches(partial_ex, batch_format="pandas")
    ex_agg = ex.groupby("payload_class").aggregate(
        Sum("extracted_chars", alias_name="extracted_chars"),
        Sum("span_chars", alias_name="span_chars"),
        Sum("n", alias_name="n_turns"))
    total_raw = int(raw.sum("raw_chars") or 0)

    def attach(df: pd.DataFrame, _total=total_raw) -> pd.DataFrame:
        df = df.copy()
        df["corpus_raw_chars"] = np.int64(_total)
        return df

    return ex_agg.map_batches(attach, batch_format="pandas")


def topk_boilerplate_turns(sf_dir: str, k: int = 20):
    """Top-k turns by boilerplate-stripped char count (raw − extracted) —
    the reference's 'top-N most-changed blocks' QA view (O3,
    notebooks/03a_llm_cleanup_qa.ipynb TOP_N=12) as sort(desc).limit(k)."""
    ds = read_transcripts(tier_for_sf_dir(sf_dir))

    # raw length must be captured before the projection drops text — carry
    # it via a pre-pass that appends raw_chars ahead of extraction
    import pyarrow as pa_
    import pyarrow.compute as pc_

    def with_raw(batch: pa_.Table) -> pa_.Table:
        rc = pc_.utf8_length(pc_.fill_null(batch["text"], ""))
        if "raw_chars" in batch.column_names:
            batch = batch.drop_columns(["raw_chars"])
        return batch.append_column("raw_chars",
                                   pc_.cast(rc, pa_.int32()))

    turns = build_turns_pipeline(ds.map_batches(with_raw,
                                                batch_format="pyarrow"),
                                 keep_cols=("raw_chars",))

    def delta(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "conv_id": df["conv_id"],
            "turn_idx": df["turn_idx"].astype(np.int32),
            "payload_class": df["payload_class"],
            "chars_removed": (df["raw_chars"].astype(np.int64) -
                              df["content_chars"].astype(np.int64))})
        return out

    from .relational import local_topk
    scored = turns.map_batches(delta, batch_format="pandas")
    return local_topk(scored, ["chars_removed", "conv_id", "turn_idx"],
                      [True, False, False], k)


def export_metrics_csv(out_dir: str) -> str:
    """Write the checkpoint manifest's per-partition metrics as a CSV
    sidecar (reference S6: per-stage QA CSV writers, e.g.
    notebooks/02_cleanup_blocks.ipynb _qa_cleanup.csv)."""
    import csv
    import os

    from ..state.manifest import load_manifest
    man = load_manifest(out_dir)
    path = os.path.join(out_dir, "metrics.csv")
    classes = sorted({c for r in man.values()
                      for c in r.get("class_histogram", {})})
    with open(path + ".tmp", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["partition", "rows", "content_chars", *classes])
        for name in sorted(man):
            r = man[name]
            w.writerow([name, r["rows"], r["content_chars"],
                        *[r["class_histogram"].get(c, 0) for c in classes]])
    os.replace(path + ".tmp", path)
    return path


def qa_against_expected(sf_dir: str):
    """Per-turn CER/WER vs the generator sidecar, aggregated: rows,
    mismatches, mean/max CER.  Expected sidecar is broadcast-free: both
    datasets are keyed and hash-bucketed, compared inside map_groups."""
    from ..functions.qa import cer, wer

    tier = tier_for_sf_dir(sf_dir)
    turns = _turns_for(sf_dir)
    exp = rd.read_parquet(expected_dir(tier),
                          columns=["conv_id", "turn_idx", "expected_main"])

    import zlib

    def to_common(df: pd.DataFrame, col: str, side: int) -> pd.DataFrame:
        # format-agnostic bucket key (crc32, like stages/assemble._add_keys)
        # — never parse structure out of an id string
        crc = np.fromiter((zlib.crc32(c.encode()) for c in df["conv_id"]),
                          dtype=np.int64, count=len(df))
        return pd.DataFrame({
            "bucket": ((df["turn_idx"].astype(np.int64) * 31 + crc) % 32)
            .astype(np.int32),
            "conv_id": df["conv_id"],
            "turn_idx": df["turn_idx"].astype(np.int32),
            "text": df[col].fillna(""),
            "side": np.full(len(df), side, dtype=np.int8)})

    a = turns.map_batches(lambda df: to_common(df, "text_extracted", 0),
                          batch_format="pandas")
    b = exp.map_batches(lambda df: to_common(df, "expected_main", 1),
                        batch_format="pandas")

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        got = g[g["side"] == 0][["conv_id", "turn_idx", "text"]]
        want = g[g["side"] == 1][["conv_id", "turn_idx", "text"]]
        m = got.merge(want, on=["conv_id", "turn_idx"],
                      suffixes=("_got", "_want"), how="inner")
        n = len(m)
        if n == 0:
            return pd.DataFrame([{"n_rows": np.int64(0),
                                  "n_mismatch": np.int64(0),
                                  "sum_cer": 0.0, "max_cer": 0.0,
                                  "sum_wer": 0.0}])
        mism = (m["text_got"] != m["text_want"])
        cers = [cer(w, t) if x else 0.0
                for w, t, x in zip(m["text_want"], m["text_got"], mism)]
        wers = [wer(w, t) if x else 0.0
                for w, t, x in zip(m["text_want"], m["text_got"], mism)]
        return pd.DataFrame([{
            "n_rows": np.int64(n),
            "n_mismatch": np.int64(mism.sum()),
            "sum_cer": float(np.sum(cers)),
            "max_cer": float(np.max(cers) if cers else 0.0),
            "sum_wer": float(np.sum(wers))}])

    per_bucket = a.union(b).groupby("bucket").map_groups(
        score_bucket, batch_format="pandas")
    totals = per_bucket.aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_mismatch", alias_name="n_mismatch"),
        Sum("sum_cer", alias_name="sum_cer"),
        Max("max_cer", alias_name="max_cer"),
        Sum("sum_wer", alias_name="sum_wer"))
    return pd.DataFrame([totals])
