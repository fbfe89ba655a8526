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
    """Per-payload-class rollup.  ORACLED over the exported turns view
    (pinned tier — turn_oracle.py): the SQL re-aggregates the same sums
    from the sequential-oracle export."""
    from .turn_oracle import ORACLE_TIER, ensure_export
    ensure_export()
    turns = build_turns_pipeline(read_transcripts(ORACLE_TIER))

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
    shrink, but tagged spans must account for the raw text).  ORACLED
    over the exported turns view (pinned tier)."""
    from .turn_oracle import ORACLE_TIER, ensure_export
    ensure_export()
    ds = read_transcripts(ORACLE_TIER)
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
    notebooks/03a_llm_cleanup_qa.ipynb TOP_N=12) as sort(desc).limit(k).
    ORACLED over the exported turns view (pinned tier)."""
    from .turn_oracle import ORACLE_TIER, ensure_export
    ensure_export()
    ds = read_transcripts(ORACLE_TIER)

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
    """Per-turn CER vs the generator sidecar, aggregated: rows,
    mismatches, sum/max CER.  Expected sidecar is broadcast-free: both
    datasets are keyed and hash-bucketed, compared inside map_groups.
    ORACLED (pinned tier): the SQL joins the exported turns to the
    generator sidecar and mirrors the CER aggregate.  In the invariant
    state (zero mismatches) both sides are exactly 0.0; a genuine
    mismatch turns the row red on n_mismatch alone, with the CER
    magnitude mirrored via levenshtein (byte-based in DuckDB — only
    non-ASCII MISMATCHES could differ in magnitude, never in redness).
    WER stays a pytest-level metric (token-level DP is not
    SQL-expressible)."""
    from ..functions.qa import cer
    from .turn_oracle import ORACLE_TIER, ensure_export

    ensure_export()
    tier = ORACLE_TIER
    turns = build_turns_pipeline(read_transcripts(ORACLE_TIER))
    exp = rd.read_parquet(expected_dir(tier),
                          columns=["conv_id", "turn_idx", "expected_main"])

    import zlib

    from ..partitioning import buckets_for
    n_buckets = buckets_for()

    def to_common(df: pd.DataFrame, col: str, side: int) -> pd.DataFrame:
        # format-agnostic bucket key (crc32, like stages/assemble._add_keys)
        # — never parse structure out of an id string
        crc = np.fromiter((zlib.crc32(c.encode()) for c in df["conv_id"]),
                          dtype=np.int64, count=len(df))
        return pd.DataFrame({
            "bucket": ((df["turn_idx"].astype(np.int64) * 31 + crc)
                       % n_buckets).astype(np.int32),
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
                                  "sum_cer": 0.0, "max_cer": 0.0}])
        mism = (m["text_got"] != m["text_want"])
        cers = [cer(w, t) if x else 0.0
                for w, t, x in zip(m["text_want"], m["text_got"], mism)]
        return pd.DataFrame([{
            "n_rows": np.int64(n),
            "n_mismatch": np.int64(mism.sum()),
            "sum_cer": float(np.sum(cers)),
            "max_cer": float(np.max(cers) if cers else 0.0)}])

    per_bucket = a.union(b).groupby("bucket").map_groups(
        score_bucket, batch_format="pandas")
    totals = per_bucket.aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_mismatch", alias_name="n_mismatch"),
        Sum("sum_cer", alias_name="sum_cer"),
        Max("max_cer", alias_name="max_cer"))
    return pd.DataFrame([totals])


def engine_block_stats(sf_dir: str):
    """Per-engine block comparison (reference G5: groupby(engine) over
    mean/std chars, block counts, confidence —
    notebooks/01_qa_pipeline_evaluation.ipynb:~393).  Parses every tool
    turn's payload and aggregates per block ``source`` tag with exact
    integer partials (count, sum, sum-of-squares, conf micros) so the
    result is bit-deterministic; the shuffle moves one row per engine per
    batch.  ORACLED over the exported per-block view (pinned tier — see
    turn_oracle.py): the SQL re-aggregates the same exact integer
    partials and mirrors the closed-form float finish verbatim."""
    from ..functions.pdfblocks import is_pdf_payload, parse_payload
    from .turn_oracle import ORACLE_TIER, ensure_export

    ensure_export()
    ds = read_transcripts(ORACLE_TIER)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        agg: dict[str, list[int]] = {}
        for text, tool in zip(df["text"], df["tool"]):
            if not tool or not isinstance(text, str) or \
                    not is_pdf_payload(text):
                continue
            kept, low, _pages = parse_payload(text, min_conf=0.0)
            for b in kept + low:
                a = agg.setdefault(b.source, [0, 0, 0, 0])
                n = len(b.text)
                a[0] += 1
                a[1] += n
                a[2] += n * n
                a[3] += int(round(b.conf * 1_000_000))
        if not agg:
            return pd.DataFrame({
                "source": pd.Series([], dtype=str),
                "n_blocks": pd.Series([], dtype=np.int64),
                "chars_sum": pd.Series([], dtype=np.int64),
                "chars_sumsq": pd.Series([], dtype=np.int64),
                "conf_u": pd.Series([], dtype=np.int64)})
        rows = sorted(agg.items())
        return pd.DataFrame({
            "source": [s for s, _ in rows],
            "n_blocks": np.array([a[0] for _, a in rows], dtype=np.int64),
            "chars_sum": np.array([a[1] for _, a in rows], dtype=np.int64),
            "chars_sumsq": np.array([a[2] for _, a in rows], dtype=np.int64),
            "conf_u": np.array([a[3] for _, a in rows], dtype=np.int64)})

    partials = ds.map_batches(partial, batch_format="pandas")
    agg = partials.groupby("source").aggregate(
        Sum("n_blocks", alias_name="n_blocks"),
        Sum("chars_sum", alias_name="chars_sum"),
        Sum("chars_sumsq", alias_name="chars_sumsq"),
        Sum("conf_u", alias_name="conf_u"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_blocks"].to_numpy().astype(np.float64)
        mean = df["chars_sum"] / n
        var = df["chars_sumsq"] / n - mean ** 2
        return pd.DataFrame({
            "source": df["source"],
            "n_blocks": df["n_blocks"],
            "mean_chars": mean,
            "std_chars": np.sqrt(np.maximum(var, 0.0)),
            "mean_conf": df["conf_u"] / n / 1_000_000.0})

    return agg.map_batches(finish, batch_format="pandas")


_SANCTIONED_KINDS = {"boilerplate", "header", "footer", "dup", "lowconf"}


def qa_quality_gate(sf_dir: str, max_content_drop: float = 0.15):
    """Composite quality score + content-drop gate per payload class
    (reference G8/G10: 0.4·conf + 0.3·order + 0.3·preservation and the
    ``max_content_drop=0.15`` problem-page gate,
    notebooks/qa_pipeline_evaluator.py:717-768).

    Measurable analogues over the turns schema (weights preserved):
    - conf health   (0.4): 1 − lowconf-span char fraction,
    - cleanliness   (0.3): 1 − duplicate-block char fraction,
    - preservation  (0.3): 1 − UNSANCTIONED drop ratio, where sanctioned
      drops are span-tagged (boilerplate/header/footer/dup/lowconf) and
      unsanctioned = discovered content chars − sanctioned − extracted.
    A problem turn has unsanctioned drop ratio > max_content_drop — the
    engine's invariant is that this is ~always 0 (content is tagged,
    never silently lost).  ORACLED over the exported turns view (pinned
    tier): the SQL re-aggregates the exported span-kind char sums and
    mirrors the float score expressions verbatim."""
    from .turn_oracle import ORACLE_TIER, ensure_export
    ensure_export()
    turns = build_turns_pipeline(read_transcripts(ORACLE_TIER))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list[int]] = {}
        for cls, spans, chars in zip(df["payload_class"], df["spans"],
                                     df["content_chars"]):
            a = rows.setdefault(cls, [0, 0, 0, 0, 0, 0, 0])
            discovered = sanctioned = low = dup = 0
            for s in ([] if spans is None else spans):
                ln = int(s["end"]) - int(s["start"])
                discovered += ln
                if s["kind"] in _SANCTIONED_KINDS:
                    sanctioned += ln
                if s["kind"] == "lowconf":
                    low += ln
                if s["kind"] == "dup":
                    dup += ln
            unsanc = max(0, discovered - sanctioned - int(chars))
            a[0] += 1
            a[1] += discovered
            a[2] += sanctioned
            a[3] += low
            a[4] += dup
            a[5] += unsanc
            if discovered > 0 and unsanc / discovered > max_content_drop:
                a[6] += 1
        out = sorted(rows.items())
        return pd.DataFrame({
            "payload_class": [c for c, _ in out],
            "n_turns": np.array([a[0] for _, a in out], dtype=np.int64),
            "discovered": np.array([a[1] for _, a in out], dtype=np.int64),
            "sanctioned": np.array([a[2] for _, a in out], dtype=np.int64),
            "lowconf_chars": np.array([a[3] for _, a in out],
                                      dtype=np.int64),
            "dup_chars": np.array([a[4] for _, a in out], dtype=np.int64),
            "unsanctioned": np.array([a[5] for _, a in out],
                                     dtype=np.int64),
            "n_problem": np.array([a[6] for _, a in out], dtype=np.int64)})

    partials = turns.map_batches(partial, batch_format="pandas")
    agg = partials.groupby("payload_class").aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Sum("discovered", alias_name="discovered"),
        Sum("sanctioned", alias_name="sanctioned"),
        Sum("lowconf_chars", alias_name="lowconf_chars"),
        Sum("dup_chars", alias_name="dup_chars"),
        Sum("unsanctioned", alias_name="unsanctioned"),
        Sum("n_problem", alias_name="n_problem"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        disc = np.maximum(df["discovered"].to_numpy().astype(np.float64), 1.0)
        conf_health = 1.0 - df["lowconf_chars"] / disc
        cleanliness = 1.0 - df["dup_chars"] / disc
        preservation = 1.0 - df["unsanctioned"] / disc
        return pd.DataFrame({
            "payload_class": df["payload_class"],
            "n_turns": df["n_turns"],
            "n_problem": df["n_problem"],
            "conf_health": conf_health,
            "cleanliness": cleanliness,
            "preservation": preservation,
            "composite_score": (0.4 * conf_health + 0.3 * cleanliness
                                + 0.3 * preservation)})

    return agg.map_batches(finish, batch_format="pandas")


def best_variant_extraction(sf_dir: str):
    """Per-row argmax across extraction strategies (reference O5
    ``select_best_ocr_result`` by block count,
    prefect_pipeline.py:113-127): every tool-payload turn is extracted
    under the default (strict) and a lenient (min_conf 0.30, fixed
    tolerances) configuration inside ONE batch pass; the winner is chosen
    deterministically by (blocks_kept, content_chars, variant name).
    ORACLED over the exported per-variant view (pinned tier): the SQL
    re-runs the argmax as a QUALIFY window with the identical
    tie-break."""
    from ..config import DEFAULT_EXTRACT, ExtractConfig
    from ..functions.pdfblocks import extract_pdf_payload, is_pdf_payload
    from .turn_oracle import ORACLE_TIER, ensure_export

    ensure_export()
    lenient = ExtractConfig(min_conf=0.30, adaptive_layout=False)
    variants = (("strict", DEFAULT_EXTRACT), ("lenient", lenient))

    ds = read_transcripts(ORACLE_TIER)

    def choose(df: pd.DataFrame) -> pd.DataFrame:
        convs, turns, names, kept_l, chars_l = [], [], [], [], []
        for conv, tix, text, tool in zip(df["conv_id"], df["turn_idx"],
                                         df["text"], df["tool"]):
            if not tool or not isinstance(text, str) or \
                    not is_pdf_payload(text):
                continue
            best = None
            for name, cfg in variants:
                out, _spans, kept, _dropped = extract_pdf_payload(text, cfg)
                cand = (kept, len(out), name)
                if best is None or cand > best:
                    best = cand
            convs.append(conv)
            turns.append(int(tix))
            names.append(best[2])
            kept_l.append(best[0])
            chars_l.append(best[1])
        return pd.DataFrame({
            "conv_id": convs,
            "turn_idx": np.array(turns, dtype=np.int32),
            "variant": names,
            "blocks_kept": np.array(kept_l, dtype=np.int32),
            "content_chars": np.array(chars_l, dtype=np.int32)})

    return ds.map_batches(choose, batch_format="pandas")


def export_qa_report_html(out_dir: str) -> str:
    """Static HTML QA report over the checkpoint manifest (reference S7 —
    the HTML report writer in qa_pipeline_evaluator.py:819-866, kept as a
    driver-side post-process exactly as SURVEY.md maps it: debug
    artifacts never run inside the dataflow)."""
    import html
    import os

    from ..state.manifest import load_manifest
    man = load_manifest(out_dir)
    classes = sorted({c for r in man.values()
                      for c in r.get("class_histogram", {})})
    rows_html = []
    tot_rows = tot_chars = 0
    for name in sorted(man):
        r = man[name]
        tot_rows += r["rows"]
        tot_chars += r["content_chars"]
        cells = "".join(
            f"<td>{r['class_histogram'].get(c, 0)}</td>" for c in classes)
        rows_html.append(
            f"<tr><td>{html.escape(name)}</td><td>{r['rows']}</td>"
            f"<td>{r['content_chars']}</td>{cells}</tr>")
    head = "".join(f"<th>{html.escape(c)}</th>" for c in classes)
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>extraction QA report</title><style>"
        "body{font-family:sans-serif}table{border-collapse:collapse}"
        "td,th{border:1px solid #999;padding:4px 8px;text-align:right}"
        "td:first-child,th:first-child{text-align:left}</style></head>"
        f"<body><h1>Extraction QA report</h1>"
        f"<p>{len(man)} partitions · {tot_rows} turns · "
        f"{tot_chars} extracted chars</p>"
        f"<table><tr><th>partition</th><th>rows</th><th>chars</th>{head}"
        f"</tr>{''.join(rows_html)}</table></body></html>")
    path = os.path.join(out_dir, "qa_report.html")
    with open(path + ".tmp", "w") as f:
        f.write(doc)
    os.replace(path + ".tmp", path)
    return path


def payload_coverage_grid(sf_dir: str, grid: int = 8):
    """Per-page bbox coverage histogram (reference G9 coverage mask,
    02_ocr_verifier.py:91-106 — 2-D bin counts of block coverage): each
    tool payload page yields a grid×grid int64 tensor column counting
    kept blocks whose bbox overlaps each cell.  Pure per-turn numpy
    reduction inside the batch map; no shuffle."""
    from ..functions.pdfblocks import is_pdf_payload, parse_payload

    ds = read_transcripts(tier_for_sf_dir(sf_dir))

    def grids(df: pd.DataFrame) -> pd.DataFrame:
        convs, turns, pages, cells = [], [], [], []
        for conv, tix, text, tool in zip(df["conv_id"], df["turn_idx"],
                                         df["text"], df["tool"]):
            if not tool or not isinstance(text, str) or \
                    not is_pdf_payload(text):
                continue
            kept, _low, pdims = parse_payload(text)
            by_page: dict[int, np.ndarray] = {}
            for b in kept:
                w, h = pdims.get(b.page, (800.0, 1000.0))
                g = by_page.setdefault(b.page,
                                       np.zeros((grid, grid), np.int64))
                x0 = int(np.clip(b.x0 / w * grid, 0, grid - 1))
                x1 = int(np.clip((b.x1 - 1e-9) / w * grid, 0, grid - 1))
                y0 = int(np.clip(b.y0 / h * grid, 0, grid - 1))
                y1 = int(np.clip((b.y1 - 1e-9) / h * grid, 0, grid - 1))
                g[y0:y1 + 1, x0:x1 + 1] += 1
            for page in sorted(by_page):
                convs.append(conv)
                turns.append(int(tix))
                pages.append(page)
                cells.append(by_page[page].reshape(-1))
        return pd.DataFrame({
            "conv_id": convs,
            "turn_idx": np.array(turns, dtype=np.int32),
            "page": np.array(pages, dtype=np.int32),
            "coverage": cells})

    return ds.map_batches(grids, batch_format="pandas")


# Exact oracle for ``engine_block_stats``: aggregate the exported
# per-block rows with the SAME integer partials and the IDENTICAL
# closed-form float expressions as the Ray finish step (single IEEE
# divisions / multiplies over exact ints are bit-equal across engines).
def engine_block_stats_sql() -> str:
    from .turn_oracle import blocks_parquet
    return f"""
WITH agg AS (
  SELECT source,
         count(*) AS n_blocks,
         sum(n_chars) AS chars_sum,
         sum(n_chars * n_chars) AS chars_sumsq,
         sum(conf_u) AS conf_u
  FROM read_parquet('{blocks_parquet()}') GROUP BY source),
f AS (
  SELECT source, n_blocks,
         CAST(chars_sum AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS mean_chars,
         CAST(chars_sumsq AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS msq,
         (CAST(conf_u AS DOUBLE) / CAST(n_blocks AS DOUBLE)) / 1000000.0
           AS mean_conf
  FROM agg)
SELECT source, n_blocks, mean_chars,
       sqrt(greatest(msq - mean_chars * mean_chars, 0.0)) AS std_chars,
       mean_conf
FROM f
"""


# Exact oracle for ``best_variant_extraction``: per-turn argmax over the
# exported variant stats with the Python tuple tie-break
# (blocks_kept, content_chars, variant) — 'strict' > 'lenient'.
def best_variant_sql() -> str:
    from .turn_oracle import variants_parquet
    return f"""
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx, variant,
       CAST(blocks_kept AS INT) AS blocks_kept,
       CAST(content_chars AS INT) AS content_chars
FROM read_parquet('{variants_parquet()}')
QUALIFY row_number() OVER (
    PARTITION BY conv_id, turn_idx
    ORDER BY blocks_kept DESC, content_chars DESC, variant DESC) = 1
"""


def qa_turn_metrics_sql() -> str:
    from .turn_oracle import turns_parquet
    return f"""
SELECT payload_class, count(*) AS n_turns,
       CAST(sum(content_chars) AS BIGINT) AS content_chars,
       CAST(sum(blocks_kept) AS BIGINT) AS blocks_kept,
       CAST(sum(blocks_dropped_dup) AS BIGINT) AS blocks_dropped_dup,
       CAST(sum(CASE WHEN content_chars = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_empty_out
FROM read_parquet('{turns_parquet()}')
GROUP BY payload_class
"""


def qa_content_accounting_sql() -> str:
    from .turn_oracle import turns_parquet
    tp = turns_parquet()
    return f"""
SELECT payload_class,
       CAST(sum(content_chars) AS BIGINT) AS extracted_chars,
       CAST(sum(span_chars) AS BIGINT) AS span_chars,
       count(*) AS n_turns,
       (SELECT CAST(sum(raw_chars) AS BIGINT)
        FROM read_parquet('{tp}')) AS corpus_raw_chars
FROM read_parquet('{tp}')
GROUP BY payload_class
"""


def topk_boilerplate_sql() -> str:
    from .turn_oracle import turns_parquet
    return f"""
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx, payload_class,
       CAST(raw_chars - content_chars AS BIGINT) AS chars_removed
FROM read_parquet('{turns_parquet()}')
ORDER BY chars_removed DESC, conv_id, turn_idx
LIMIT 20
"""


def qa_quality_gate_sql(max_content_drop: float = 0.15) -> str:
    from .turn_oracle import turns_parquet
    return f"""
WITH t AS (
  SELECT payload_class, disc_chars, sanc_chars, lowconf_chars, dup_chars,
         greatest(disc_chars - sanc_chars - content_chars, 0) AS unsanc
  FROM read_parquet('{turns_parquet()}')),
agg AS (
  SELECT payload_class, count(*) AS n_turns,
         CAST(sum(disc_chars) AS BIGINT) AS discovered,
         CAST(sum(lowconf_chars) AS BIGINT) AS lowconf_chars,
         CAST(sum(dup_chars) AS BIGINT) AS dup_chars,
         CAST(sum(unsanc) AS BIGINT) AS unsanctioned,
         CAST(sum(CASE WHEN disc_chars > 0 AND
                       CAST(unsanc AS DOUBLE) / CAST(disc_chars AS DOUBLE)
                       > {max_content_drop} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_problem
  FROM t GROUP BY payload_class),
f AS (
  SELECT payload_class, n_turns, n_problem,
         greatest(CAST(discovered AS DOUBLE), 1.0) AS disc,
         lowconf_chars, dup_chars, unsanctioned
  FROM agg)
SELECT payload_class, n_turns, n_problem,
       1.0 - lowconf_chars / disc AS conf_health,
       1.0 - dup_chars / disc AS cleanliness,
       1.0 - unsanctioned / disc AS preservation,
       0.4 * (1.0 - lowconf_chars / disc)
       + 0.3 * (1.0 - dup_chars / disc)
       + 0.3 * (1.0 - unsanctioned / disc) AS composite_score
FROM f
"""


def qa_against_expected_sql() -> str:
    from .turn_oracle import expected_glob, turns_parquet
    return f"""
WITH j AS (
  SELECT t.text_extracted AS got, e.expected_main AS want
  FROM read_parquet('{turns_parquet()}') t
  JOIN read_parquet('{expected_glob()}') e
    USING (conv_id, turn_idx)),
s AS (
  SELECT got, want,
         CASE WHEN got = want THEN 0.0
              WHEN want = '' THEN 1.0
              ELSE CAST(levenshtein(want, got) AS DOUBLE)
                   / CAST(length(want) AS DOUBLE) END AS cer
  FROM j)
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN got <> want THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mismatch,
       CAST(coalesce(sum(cer), 0.0) AS DOUBLE) AS sum_cer,
       CAST(coalesce(max(cer), 0.0) AS DOUBLE) AS max_cer
FROM s
"""


def payload_coverage_digest(sf_dir: str, grid: int = 8):
    """Compact comparable face of the coverage grid (G9): per page,
    total block-cell hits + md5 of the flattened int64 grid.  The Ray
    side recomputes the grids from raw payloads; the oracle reads the
    sequential-oracle export — a green row is grid-bit-level parity."""
    import hashlib

    from ..functions.pdfblocks import is_pdf_payload, parse_payload
    from .turn_oracle import ORACLE_TIER, ensure_export

    ensure_export()
    ds = read_transcripts(ORACLE_TIER)

    def digests(df: pd.DataFrame) -> pd.DataFrame:
        convs, turns, pages, hits, md5s = [], [], [], [], []
        for conv, tix, text, tool in zip(df["conv_id"], df["turn_idx"],
                                         df["text"], df["tool"]):
            if not tool or not isinstance(text, str) or \
                    not is_pdf_payload(text):
                continue
            kept, _low, pdims = parse_payload(text)
            by_page: dict[int, np.ndarray] = {}
            for b in kept:
                w, h = pdims.get(b.page, (800.0, 1000.0))
                g = by_page.setdefault(b.page,
                                       np.zeros((grid, grid), np.int64))
                x0 = int(np.clip(b.x0 / w * grid, 0, grid - 1))
                x1 = int(np.clip((b.x1 - 1e-9) / w * grid, 0, grid - 1))
                y0 = int(np.clip(b.y0 / h * grid, 0, grid - 1))
                y1 = int(np.clip((b.y1 - 1e-9) / h * grid, 0, grid - 1))
                g[y0:y1 + 1, x0:x1 + 1] += 1
            for page in sorted(by_page):
                g = by_page[page]
                convs.append(conv)
                turns.append(int(tix))
                pages.append(page)
                hits.append(int(g.sum()))
                md5s.append(hashlib.md5(g.tobytes()).hexdigest())
        return pd.DataFrame({
            "conv_id": pd.Series(convs, dtype=object),
            "turn_idx": np.array(turns, dtype=np.int32),
            "page": np.array(pages, dtype=np.int32),
            "total_hits": np.array(hits, dtype=np.int64),
            "coverage_md5": pd.Series(md5s, dtype=object)})

    return ds.map_batches(digests, batch_format="pandas")


def payload_coverage_digest_sql() -> str:
    from .turn_oracle import coverage_parquet
    return f"""
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
       CAST(page AS INT) AS page, total_hits, coverage_md5
FROM read_parquet('{coverage_parquet()}')
"""
