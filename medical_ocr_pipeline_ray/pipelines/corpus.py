"""Corpus-construction operators over the ``documents`` table.

The second half of the training-data toolbox (first half: textops.py /
dedup.py): segment-level global dedup, RAG chunking, unigram-LM
commonness scoring, a df-capped inverted index, URL/domain harvesting
and distributed sequence packing.  Every operator here is EXACT and
carries a bit-equal DuckDB oracle (the *_SQL strings) — semantics are
designed for cross-engine equality (ASCII regex classes, integer
arithmetic, single final IEEE divisions, deterministic tie-breaks; see
pipelines/relational.py design rules).

Scale shapes used (all established patterns in this repo):
- bucketed exchange by ``crc32(key) % P`` with ``P =
  partitioning.buckets_for(bytes)`` — a key lives in exactly one bucket,
  so bucket-local aggregates are exact global aggregates
  (doc_segment_dedup, doc_unigram_commonness, bigram_postings);
- per-batch combiner + tiny bounded-key groupby (doc_domain_counts);
- distributed prefix scan: per-range-bucket totals (P scalars to the
  driver) → broadcast offsets → bucket-local cumsum (doc_pack_bins);
- stateless vectorized batch map (doc_chunks).

Reference parity: the reference has no corpus layer (it is a per-page
OCR orchestration); these generalize its text-normalization semantics
(notebooks/qa_pipeline_evaluator.py:322-325 term harvest,
notebooks/04_json_extraction.ipynb:~89 chunks_by_size) to the
corpus-wide operations a 100 TB pre-training pipeline needs.
"""

from __future__ import annotations

import hashlib
import zlib
from collections import Counter

import numpy as np
import pandas as pd

import ray.data as rd

from ..functions.fingerprint import words
from ..partitioning import buckets_for, checked_put, table_bytes


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=list(columns))


def _doc_buckets(sf_dir: str, n_buckets: int | None) -> int:
    return n_buckets or buckets_for(table_bytes(sf_dir, "documents"))


# ---------------------------------------------------------------------------
# segment-level global dedup (CCNet-style paragraph dedup, determinized)
# ---------------------------------------------------------------------------

_SEG_WORDS = 10          # words per segment (synth docs are single-line,
#                          so "paragraphs" are determinized as disjoint
#                          10-word windows — the shuffle shape is identical
#                          to newline-paragraph dedup on real web text)


def doc_segment_dedup(sf_dir: str, n_buckets: int | None = None):
    """Corpus-global segment dedup — the CCNet/C4-style pass that removes
    boilerplate paragraphs repeated ACROSS documents (not within, which
    is doc_repetition_stats' job): a segment occurrence survives iff its
    (doc_id, seg_idx) is the global minimum over all occurrences of that
    segment string.  Emits per doc: segment counts and the md5 of the
    cleaned text (kept segments joined in order).

    Two bucketed exchanges, exact at any scale:
    1. segments shuffle by ``crc32(seg) % P``; ALL occurrences of a
       segment land in one bucket, so the keep/drop mark is a
       bucket-local first-by-(doc_id, seg_idx).  Dropped rows have their
       text nulled before the second exchange — only surviving text
       travels twice.
    2. marked rows shuffle by ``doc_id % P`` and fold per doc (sort by
       seg_idx, join kept, md5).
    """
    n_b = _doc_buckets(sf_dir, n_buckets)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, segs = [], [], []
        for did, t in zip(df["doc_id"], df["text"]):
            w = words(t)
            if not w:
                continue
            did = int(did)
            for i in range(0, (len(w) + _SEG_WORDS - 1) // _SEG_WORDS):
                ids.append(did)
                idxs.append(i)
                segs.append(" ".join(
                    w[i * _SEG_WORDS:(i + 1) * _SEG_WORDS]))
        sb = np.fromiter((zlib.crc32(s.encode()) % n_b for s in segs),
                         dtype=np.int64, count=len(segs))
        return pd.DataFrame({
            "sb": sb.astype(np.int32),
            "doc_id": np.array(ids, dtype=np.int64),
            "seg_idx": np.array(idxs, dtype=np.int64),
            "seg": pd.Series(segs, dtype=object)})

    segs = _docs(sf_dir).map_batches(explode, batch_format="pandas")

    # ARROW-NATIVE folds (round-3 verdict #6): the segment strings ride
    # both exchanges, so the folds keep them as Arrow arrays — sort /
    # adjacent-equality / if_else all run in pyarrow.compute, and only
    # the SURVIVING segments are materialized as Python strings (for the
    # md5), never the whole exchange.
    import pyarrow as pa
    import pyarrow.compute as pc

    def mark(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        n = len(g)
        # hash-encode the segment strings once (O(n), no string sort) —
        # first-occurrence-by-(doc_id, seg_idx) then reduces to an
        # integer lexsort over the codes
        enc = pc.dictionary_encode(g["seg"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy() if n else np.array([], np.int32)
        doc = g["doc_id"].to_numpy()
        seg_idx = g["seg_idx"].to_numpy()
        order = np.lexsort((seg_idx, doc, codes))
        codes_s = codes[order]
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = codes_s[1:] != codes_s[:-1]
        keep = np.empty(n, dtype=bool)
        keep[order] = first
        return pa.table({
            "db": pa.array((doc % n_b).astype(np.int32)),
            "doc_id": g["doc_id"],
            "seg_idx": g["seg_idx"],
            "seg": pc.if_else(pa.array(keep), g["seg"],
                              pa.scalar("", pa.string())),
            "keep": pa.array(keep)})

    marked = segs.groupby("sb").map_groups(mark, batch_format="pyarrow")

    def fold(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        order = pc.sort_indices(
            g, sort_keys=[("doc_id", "ascending"),
                          ("seg_idx", "ascending")])
        g = g.take(order)
        doc = g["doc_id"].to_numpy()
        keepm = g["keep"].to_numpy(zero_copy_only=False)
        # only kept segments become Python strings (dropped are "")
        seg_py = g["seg"].to_pylist()
        bounds = np.flatnonzero(np.diff(doc)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(doc)]])
        ids, n_seg, n_kept, md5s = [], [], [], []
        for s, e in zip(starts, ends):
            if s == e:
                continue
            kept = [seg_py[i] for i in range(s, e) if keepm[i]]
            ids.append(int(doc[s]))
            n_seg.append(e - s)
            n_kept.append(len(kept))
            md5s.append(hashlib.md5(
                " ".join(kept).encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(np.array(ids, dtype=np.int64)),
            "n_segments": pa.array(np.array(n_seg, dtype=np.int64)),
            "n_kept": pa.array(np.array(n_kept, dtype=np.int64)),
            "clean_md5": pa.array(md5s, pa.string())})

    return marked.groupby("db").map_groups(fold, batch_format="pyarrow")


DOC_SEGMENT_DEDUP_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents),
segs AS (
  SELECT doc_id,
    unnest(generate_series(0,
      CAST(ceil(len(w) / {_SEG_WORDS}.0) AS BIGINT) - 1)) AS seg_idx,
    unnest(list_transform(
      generate_series(0, CAST(ceil(len(w) / {_SEG_WORDS}.0) AS BIGINT) - 1),
      i -> array_to_string(
        w[(i * {_SEG_WORDS} + 1):(i * {_SEG_WORDS} + {_SEG_WORDS})], ' ')))
      AS seg
  FROM w WHERE len(w) > 0),
marked AS (
  SELECT doc_id, seg_idx, seg,
    row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segs)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                          ORDER BY seg_idx), '')) AS clean_md5
FROM marked GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# sliding-window chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------

_CHUNK_CHARS = 120
_CHUNK_STRIDE = 80


def doc_chunks(sf_dir: str):
    """Overlapping sliding-window chunking (window {_CHUNK_CHARS} chars,
    stride {_CHUNK_STRIDE}) — the RAG-indexing / context-window prep op;
    char-budget splitting generalizes the reference's ~90k-char
    ``chunks_by_size`` guard (notebooks/04_json_extraction.ipynb:~89).
    Emits (doc_id, chunk_idx, chunk_md5, n_chunk_chars) so the driver
    compares content without shipping chunk text.  Stateless per-batch
    map, no shuffle — streams at read bandwidth."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, md5s, lens = [], [], [], []
        for did, t in zip(df["doc_id"], df["text"]):
            n = len(t)
            if n == 0:
                continue
            did = int(did)
            for i in range(0, (n - 1) // _CHUNK_STRIDE + 1):
                c = t[i * _CHUNK_STRIDE:i * _CHUNK_STRIDE + _CHUNK_CHARS]
                ids.append(did)
                idxs.append(i)
                md5s.append(hashlib.md5(c.encode("utf-8")).hexdigest())
                lens.append(len(c))
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype=np.int64),
            "chunk_idx": np.array(idxs, dtype=np.int64),
            "chunk_md5": pd.Series(md5s, dtype=object),
            "n_chunk_chars": np.array(lens, dtype=np.int64)})

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_CHUNKS_SQL = f"""
SELECT doc_id,
  unnest(generate_series(0,
    CAST(floor((length(text) - 1) / {_CHUNK_STRIDE}.0) AS BIGINT)))
    AS chunk_idx,
  unnest(list_transform(
    generate_series(0,
      CAST(floor((length(text) - 1) / {_CHUNK_STRIDE}.0) AS BIGINT)),
    i -> md5(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INTEGER),
                    {_CHUNK_CHARS})))) AS chunk_md5,
  unnest(list_transform(
    generate_series(0,
      CAST(floor((length(text) - 1) / {_CHUNK_STRIDE}.0) AS BIGINT)),
    i -> CAST(length(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INTEGER),
                            {_CHUNK_CHARS})) AS BIGINT)))
    AS n_chunk_chars
FROM documents WHERE length(text) > 0
"""


# ---------------------------------------------------------------------------
# unigram-LM commonness scoring (perplexity-proxy quality signal)
# ---------------------------------------------------------------------------

def doc_unigram_commonness(sf_dir: str, n_buckets: int | None = None):
    """Unigram language-model commonness score per document — the
    perplexity-proxy quality signal (CCNet uses a KenLM; the unigram
    integer form keeps the identical dataflow while staying bit-exact):
    for each token occurrence, its corpus-wide count; per doc the sum
    (``freq_sum``) and mean.  High mean = stereotyped text, low mean =
    rare-token (noisy or novel) text.

    Same token-partitioned two-exchange shape as doc_tfidf_top_terms —
    explode (term, doc, tf), shuffle by ``crc32(term) % P`` where the
    bucket-local ``sum(tf)`` per term IS its exact corpus count (no
    driver vocabulary, no broadcast DF map) — but integer arithmetic
    end-to-end, so unlike TF-IDF it carries a bit-equal SQL oracle.  The
    one float (``mean_token_freq``) is a single IEEE division of exact
    int64s, identical across engines.  int64 bound: freq_sum ≤
    n_doc_tokens × max_term_count — overflows only past ~3e9-token terms
    on 3e9-token docs; web corpora cap doc length long before that."""
    n_b = _doc_buckets(sf_dir, n_buckets)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, terms, tfs = [], [], []
        for did, t in zip(df["doc_id"], df["text"]):
            c = Counter(words(t))
            did = int(did)
            for w, n in c.items():
                ids.append(did)
                terms.append(w)
                tfs.append(n)
        tb = np.fromiter((zlib.crc32(w.encode()) % n_b for w in terms),
                         dtype=np.int64, count=len(terms))
        return pd.DataFrame({
            "tb": tb.astype(np.int32),
            "term": pd.Series(terms, dtype=object),
            "doc_id": np.array(ids, dtype=np.int64),
            "tf": np.array(tfs, dtype=np.int64)})

    exploded = _docs(sf_dir).map_batches(explode, batch_format="pandas")

    def score(g: pd.DataFrame) -> pd.DataFrame:
        # corpus count of a term is complete inside its token bucket
        c = g.groupby("term", sort=False)["tf"].transform("sum") \
            .to_numpy(dtype=np.int64)
        tf = g["tf"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "db": (g["doc_id"].to_numpy() % n_b).astype(np.int32),
            "doc_id": g["doc_id"].to_numpy(),
            "tf": tf,
            "contrib": tf * c})

    contribs = exploded.groupby("tb").map_groups(score,
                                                 batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", sort=False).agg(
            n_tokens=("tf", "sum"), freq_sum=("contrib", "sum"))
        return pd.DataFrame({
            "doc_id": agg.index.to_numpy().astype(np.int64),
            "n_tokens": agg["n_tokens"].to_numpy(np.int64),
            "freq_sum": agg["freq_sum"].to_numpy(np.int64),
            "mean_token_freq":
                agg["freq_sum"].to_numpy(np.float64)
                / agg["n_tokens"].to_numpy(np.float64)})

    return contribs.groupby("db").map_groups(fold, batch_format="pandas")


DOC_UNIGRAM_SQL = """
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
    AS tok
  FROM documents),
cc AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
d AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok)
SELECT doc_id,
  CAST(sum(tf) AS BIGINT) AS n_tokens,
  CAST(sum(tf * c) AS BIGINT) AS freq_sum,
  CAST(sum(tf * c) AS DOUBLE) / CAST(sum(tf) AS DOUBLE)
    AS mean_token_freq
FROM d JOIN cc USING (tok)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# df-capped inverted index (bigram postings)
# ---------------------------------------------------------------------------

_POSTINGS_MIN_DF = 2
_POSTINGS_MAX_DF = 40


def bigram_postings(sf_dir: str, n_buckets: int | None = None):
    """Inverted-index build: posting lists (sorted doc_ids) per bigram,
    df-banded to [{_POSTINGS_MIN_DF}, {_POSTINGS_MAX_DF}] — the standard
    IR pruning (hapax noise below, stopword-grade terms above; the band
    bounds every posting string by construction, so no silent cap is
    needed).  One bucketed exchange by ``crc32(bigram) % P``: a bigram's
    rows all land in one bucket, so df / total / postings are exact
    bucket-local aggregates; the per-(bigram, doc) pre-count inside
    ``map_batches`` is the combiner that keeps the exchange at
    distinct-pair granularity."""
    n_b = _doc_buckets(sf_dir, n_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for did, t in zip(df["doc_id"], df["text"]):
            w = words(t)
            did = int(did)
            for bg in map(" ".join, zip(w, w[1:])):
                c[(bg, did)] += 1
        if not c:
            return pd.DataFrame({
                "bb": pd.Series([], dtype=np.int32),
                "bigram": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64)})
        keys = sorted(c)
        grams = [k[0] for k in keys]
        bb = np.fromiter((zlib.crc32(g.encode()) % n_b for g in grams),
                         dtype=np.int64, count=len(grams))
        return pd.DataFrame({
            "bb": bb.astype(np.int32),
            "bigram": pd.Series(grams, dtype=object),
            "doc_id": np.array([k[1] for k in keys], dtype=np.int64),
            "n": np.array([c[k] for k in keys], dtype=np.int64)})

    pairs = _docs(sf_dir).map_batches(partial, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # a (bigram, doc) pair can span batches — re-sum, then band by df
        g = g.groupby(["bigram", "doc_id"], as_index=False)["n"].sum()
        g = g.sort_values(["bigram", "doc_id"], kind="mergesort")
        rows = []
        for bg, d in g.groupby("bigram", sort=False):
            df_ = len(d)
            if not (_POSTINGS_MIN_DF <= df_ <= _POSTINGS_MAX_DF):
                continue
            rows.append({
                "bigram": bg, "df": df_,
                "n_occ": int(d["n"].sum()),
                "postings": ",".join(str(int(i)) for i in d["doc_id"])})
        out = pd.DataFrame(rows, columns=["bigram", "df", "n_occ",
                                          "postings"])
        return out.astype({"df": np.int64, "n_occ": np.int64})

    return pairs.groupby("bb").map_groups(fold, batch_format="pandas")


BIGRAM_POSTINGS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents),
bg AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
                                       i -> w[i] || ' ' || w[i + 1]))
    AS bigram
  FROM t WHERE len(w) > 1),
per AS (
  SELECT bigram, doc_id, count(*) AS n FROM bg GROUP BY bigram, doc_id)
SELECT bigram, CAST(count(*) AS BIGINT) AS df,
  CAST(sum(n) AS BIGINT) AS n_occ,
  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM per GROUP BY bigram
HAVING count(*) BETWEEN {_POSTINGS_MIN_DF} AND {_POSTINGS_MAX_DF}
"""


# ---------------------------------------------------------------------------
# URL harvest / per-domain stats (planted-truth corpus)
# ---------------------------------------------------------------------------

# ASCII classes for RE2/Python dialect parity (same rule as the PII
# patterns, textops.py); one capture group -> re.findall and DuckDB
# regexp_extract_all(..., 1) both return the domain alone.
_URL_DOMAIN_PAT = r"https?://([A-Za-z0-9.\-]+)"


def url_augmented_docs(sf_dir: str):
    """documents ∪ deterministically planted URLs by doc_id residue (the
    synth corpus has no natural URLs) — same planted-truth pattern as
    ``textops.pii_augmented_docs``, reproduced bit-identically in the
    SQL oracle."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        texts = []
        for did, t in zip(ids, df["text"]):
            did = int(did)
            if did % 4 == 0:
                t = t + f" see https://ex{did % 10}.example.com/p/{did}"
            if did % 6 == 0:
                t = t + f" and http://site{did % 7}.org/q{did}"
            texts.append(t)
        return pd.DataFrame({"doc_id": ids, "text": texts})

    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


def doc_domain_counts(sf_dir: str):
    """Per-domain URL statistics over the (URL-planted) corpus — the
    link-graph / domain-blocklist prep pass of a web-corpus pipeline:
    total URL mentions and distinct-document counts per domain.  Scale
    shape: per-batch combiner (domain is bounded-cardinality, and a doc
    lives in exactly one batch so per-batch distinct-doc counts sum
    exactly) → one tiny groupby over domains."""
    import re

    from ray.data.aggregate import Sum

    rx = re.compile(_URL_DOMAIN_PAT)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        urls: Counter = Counter()
        docs: Counter = Counter()
        for t in df["text"]:
            ds_ = rx.findall(t)
            if not ds_:
                continue
            urls.update(ds_)
            docs.update(set(ds_))
        if not urls:
            return pd.DataFrame({
                "domain": pd.Series([], dtype=object),
                "n_urls": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64)})
        doms = sorted(urls)
        return pd.DataFrame({
            "domain": pd.Series(doms, dtype=object),
            "n_urls": np.array([urls[d] for d in doms], dtype=np.int64),
            "n_docs": np.array([docs[d] for d in doms], dtype=np.int64)})

    return url_augmented_docs(sf_dir) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("domain").aggregate(Sum("n_urls", alias_name="n_urls"),
                                     Sum("n_docs", alias_name="n_docs"))


DOC_DOMAIN_SQL = f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 4 = 0
            THEN ' see https://ex' || CAST(doc_id % 10 AS VARCHAR)
                 || '.example.com/p/' || CAST(doc_id AS VARCHAR)
            ELSE '' END
    || CASE WHEN doc_id % 6 = 0
            THEN ' and http://site' || CAST(doc_id % 7 AS VARCHAR)
                 || '.org/q' || CAST(doc_id AS VARCHAR)
            ELSE '' END
      AS text
  FROM documents),
u AS (
  SELECT doc_id,
    unnest(regexp_extract_all(text, '{_URL_DOMAIN_PAT}', 1)) AS domain
  FROM aug)
SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM u GROUP BY domain
"""


# ---------------------------------------------------------------------------
# sequence packing (distributed prefix scan)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2000        # tokens per packed training sequence


def doc_pack_bins(sf_dir: str, budget: int = _PACK_BUDGET,
                  n_buckets: int | None = None):
    """Pack documents into fixed token-budget training sequences
    (bin_id, bin_offset per doc, docs in doc_id order) — the
    sample-packing pass that turns a filtered corpus into fixed-length
    pre-training rows.  ``bin_id = floor(prefix_tokens / budget)`` where
    ``prefix_tokens`` is the token count of all lower-doc_id docs: the
    no-reset packing rule, chosen because it is a pure prefix sum and
    therefore parallelizes exactly (greedy reset packing is inherently
    sequential).

    Distributed prefix-scan shape, exact at any scale: docs range-bucket
    by ``doc_id * P // (max_id + 1)`` (contiguous doc_id ranges); pass 1
    computes the slim (doc_id, n_tokens, bucket) table ONCE (text read
    once, 24 bytes/doc retained); per-bucket token totals — P scalars,
    never rows — come to the driver for the cumulative offsets; pass 2
    folds each bucket locally (sort by doc_id, cumsum + bucket offset).
    """
    n_b = _doc_buckets(sf_dir, n_buckets)
    max_id = int(_docs(sf_dir, columns=("doc_id",)).max("doc_id"))
    span = max_id + 1

    def count(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        nt = np.fromiter((len(words(t)) for t in df["text"]),
                         dtype=np.int64, count=len(df))
        return pd.DataFrame({
            "rb": (ids * n_b // span).astype(np.int32),
            "doc_id": ids, "n_tokens": nt})

    counts = _docs(sf_dir).map_batches(count, batch_format="pandas") \
        .materialize()      # slim 3-int table; re-read twice below

    totals = counts.groupby("rb").sum("n_tokens").to_pandas() \
        .sort_values("rb")
    offs = np.zeros(n_b, dtype=np.int64)
    cum = 0
    for rb, s in zip(totals["rb"], totals["sum(n_tokens)"]):
        offs[int(rb)] = cum
        cum += int(s)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        nt = g["n_tokens"].to_numpy(np.int64)
        prefix = np.cumsum(nt) - nt + offs[int(g["rb"].iloc[0])]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tokens": nt,
            "bin_id": prefix // budget,
            "bin_offset": prefix % budget})

    return counts.groupby("rb").map_groups(fold, batch_format="pandas")


DOC_PACK_SQL = f"""
WITH n AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
  FROM documents),
p AS (
  SELECT doc_id, nt,
    COALESCE(sum(nt) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM n)
SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
  CAST(prefix // {_PACK_BUDGET} AS BIGINT) AS bin_id,
  CAST(prefix % {_PACK_BUDGET} AS BIGINT) AS bin_offset
FROM p
"""


# ---------------------------------------------------------------------------
# exact duplicate-span detection (sliding k-gram, Lee et al. style)
# ---------------------------------------------------------------------------

_SPAN_K = 8              # tokens per sliding gram


def doc_dup_spans(sf_dir: str, n_buckets: int | None = None):
    """Exact duplicated-span profiling — the sliding-window form of
    corpus-global dedup ("Deduplicating Training Data Makes Language
    Models Better": substrings repeated across a corpus are memorization
    hotspots).  For every length-{_SPAN_K} token window, mark it
    duplicated iff its gram occurs ≥ 2 times corpus-wide (any doc, any
    position); per doc emit window count, duplicated-window count and
    the duplicated fraction.

    Two bucketed exchanges, exact at any scale (same skeleton as
    doc_segment_dedup but windows SLIDE, so a gram's corpus count needs
    all occurrences — bucket by ``crc32(gram) % P``, where the
    bucket-local occurrence count per gram IS its corpus count):
    explode → gram-bucket mark + per-(doc) partial counts → doc-bucket
    fold.  Exchange 2 moves ≤ P rows per doc (partials), never grams.
    Docs shorter than {_SPAN_K} words have no window and are excluded
    (mirrors the SQL's ``len(w) >= {_SPAN_K}``)."""
    n_b = _doc_buckets(sf_dir, n_buckets)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for did, t in zip(df["doc_id"], df["text"]):
            w = words(t)
            if len(w) < _SPAN_K:
                continue
            did = int(did)
            for i in range(len(w) - _SPAN_K + 1):
                ids.append(did)
                grams.append(" ".join(w[i:i + _SPAN_K]))
        gb = np.fromiter((zlib.crc32(g.encode()) % n_b for g in grams),
                         dtype=np.int64, count=len(grams))
        return pd.DataFrame({
            "gb": gb.astype(np.int32),
            "doc_id": np.array(ids, dtype=np.int64),
            "gram": pd.Series(grams, dtype=object)})

    grams = _docs(sf_dir).map_batches(explode, batch_format="pandas")

    # ARROW-NATIVE folds (round-3 verdict #6): the gram strings ride
    # exchange 1, so the corpus-count mark runs as an Arrow sort +
    # adjacent-equality run-length — no gram ever becomes a Python
    # object or pandas object cell; the per-doc partials are pure
    # numpy bincounts.
    import pyarrow as pa
    import pyarrow.compute as pc

    def mark(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        n = len(g)
        # hash-encode the grams once (O(n), no string sort): a gram's
        # bucket-local occurrence count IS its corpus count
        enc = pc.dictionary_encode(g["gram"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy() if n else np.array([], np.int32)
        counts = np.bincount(codes) if n else np.array([], dtype=np.int64)
        dup = (counts[codes] >= 2).astype(np.float64) if n \
            else np.array([], dtype=np.float64)
        uids, inv = np.unique(g["doc_id"].to_numpy(), return_inverse=True)
        nn = np.bincount(inv).astype(np.int64) if n \
            else np.array([], dtype=np.int64)
        nd = np.bincount(inv, weights=dup).astype(np.int64) if n \
            else np.array([], dtype=np.int64)
        return pa.table({
            "db": pa.array((uids % n_b).astype(np.int32)),
            "doc_id": pa.array(uids.astype(np.int64)),
            "n": pa.array(nn),
            "n_dup": pa.array(nd)})

    partials = grams.groupby("gb").map_groups(mark, batch_format="pyarrow")

    def fold(g: pa.Table) -> pa.Table:
        doc = g["doc_id"].to_numpy()
        uids, inv = np.unique(doc, return_inverse=True)
        nn = np.bincount(inv, weights=g["n"].to_numpy()).astype(np.int64)
        nd = np.bincount(inv,
                         weights=g["n_dup"].to_numpy()).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(uids.astype(np.int64)),
            "n_grams": pa.array(nn),
            "n_dup_grams": pa.array(nd),
            "dup_frac": pa.array(nd.astype(np.float64)
                                 / nn.astype(np.float64))})

    return partials.groupby("db").map_groups(fold, batch_format="pyarrow")


DOC_DUP_SPANS_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents),
g AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(w) - {_SPAN_K} + 1),
      i -> array_to_string(w[i:(i + {_SPAN_K} - 1)], ' '))) AS gram
  FROM w WHERE len(w) >= {_SPAN_K}),
c AS (SELECT gram, count(*) AS c FROM g GROUP BY gram)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
  CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
  CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
    AS dup_frac
FROM g JOIN c USING (gram) GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# vocabulary build + OOV coverage (bounded-broadcast pattern)
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 200


def doc_vocab_oov(sf_dir: str, vocab_size: int = _VOCAB_SIZE,
                  n_buckets: int | None = None):
    """Top-V vocabulary build + per-doc out-of-vocabulary rate — the
    tokenizer-prep / coverage-audit pass.  Two phases:

    1. vocabulary: per-batch token-count partials → ``coarse_topk_counts``
       (one coarse exchange, exact global top-V by (count desc, token
       asc)) — V rows to the driver, BOUNDED BY CONSTRUCTION (this is
       the legitimate small-side broadcast, unlike a full-vocabulary DF
       map: V is a config constant, not a corpus property);
    2. ``ray.put`` the V-token set, stateless per-batch membership scan
       emitting (doc_id, n_tokens, n_oov, oov_frac).

    Corpus text is read twice (once per phase) — at 100 TB that is the
    honest cost of a data-dependent vocabulary; phase 1's exchange moves
    per-batch distinct-token partials only."""
    from .relational import coarse_topk_counts

    n_b = _doc_buckets(sf_dir, n_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            c.update(words(t))
        toks = sorted(c)
        return pd.DataFrame({
            "token": pd.Series(toks, dtype=object),
            "n": np.array([c[t] for t in toks], dtype=np.int64)})

    partials = _docs(sf_dir, columns=("text",)) \
        .map_batches(partial, batch_format="pandas")
    vocab_df = coarse_topk_counts(partials, "token", vocab_size, n_b)
    vocab_ref = checked_put(frozenset(vocab_df["token"]),
                            "OOV vocabulary")

    def scan(df: pd.DataFrame, _ref=vocab_ref) -> pd.DataFrame:
        import ray
        vocab = ray.get(_ref)           # per-worker plasma-cached
        ids, nt, noov = [], [], []
        for did, t in zip(df["doc_id"], df["text"]):
            w = words(t)
            if not w:
                continue
            ids.append(int(did))
            nt.append(len(w))
            noov.append(sum(1 for x in w if x not in vocab))
        nt_a = np.array(nt, dtype=np.int64)
        noov_a = np.array(noov, dtype=np.int64)
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype=np.int64),
            "n_tokens": nt_a,
            "n_oov": noov_a,
            "oov_frac": noov_a.astype(np.float64)
            / nt_a.astype(np.float64)})

    return _docs(sf_dir).map_batches(scan, batch_format="pandas")


DOC_VOCAB_OOV_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
    AS tok
  FROM documents),
v AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS n FROM t GROUP BY tok
    ORDER BY n DESC, tok LIMIT {_VOCAB_SIZE})),
j AS (
  SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM t LEFT JOIN v ON t.tok = v.tok)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(oov) AS BIGINT) AS n_oov,
  CAST(sum(oov) AS DOUBLE) / count(*) AS oov_frac
FROM j GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Keep-best-per-group (grouped argmax): the canonical-selection dedup
# policy — among docs sharing a (source, lang) cohort keep the longest
# (tie: lowest doc_id).  Per-batch combiner keeps ONE candidate per
# cohort per batch, so the exchange moves ≤ cohorts·batches slim rows
# and the text column never shuffles.
# ---------------------------------------------------------------------------

def doc_keep_best_per_source(sf_dir: str, n_buckets: int | None = None):
    """One representative document per (source, lang): max n_chars, tie
    min doc_id — the URL/host-canonicalization keep-best shape."""
    n_b = n_buckets or _doc_buckets(sf_dir, None)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "lang", "n_chars"])

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "lang", "n_chars", "doc_id"],
                            ascending=[True, True, False, True],
                            kind="mergesort")
        df = df.groupby(["source", "lang"], sort=False).head(1)
        h = pd.util.hash_pandas_object(
            df["source"].astype(str) + "\x00" + df["lang"].astype(str),
            index=False).to_numpy()
        return df.assign(bucket=(h % n_b).astype(np.int32))

    cands = ds.map_batches(best, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "lang", "n_chars", "doc_id"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        g = g.groupby(["source", "lang"], sort=False).head(1)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "source": g["source"].astype(object),
            "lang": g["lang"].astype(object),
            "n_chars": g["n_chars"].to_numpy(np.int64)})

    return cands.groupby("bucket").map_groups(fold, batch_format="pandas")


DOC_KEEP_BEST_SQL = """
SELECT doc_id, source, lang, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY source, lang
    ORDER BY n_chars DESC, doc_id) = 1
"""


# ---------------------------------------------------------------------------
# The flagship corpus-construction COMPOSITE: normalize → quality-gate →
# exact-dedup → sequence-pack, wired as ONE streaming pipeline (not a
# re-reading chain of the individual catalogue entries).  Stage shapes:
# the normalize/gate/hash map is stateless and drops the text
# immediately (the exchange moves (md5, doc_id, n_tokens) — 56 bytes/
# doc, never the corpus); exact dedup is a hash-bucketed min-id fold;
# packing is the doc_pack_bins distributed prefix scan over the
# survivors.  End-to-end bit-equal to a DuckDB WITH-cascade of the same
# four stages — the strongest possible oracle for a composite.
# ---------------------------------------------------------------------------

def corpus_build_pipeline(sf_dir: str, n_buckets: int | None = None,
                          budget: int = _PACK_BUDGET):
    """Kept docs after NFC-normalize + Gopher gates + exact dedup, each
    assigned its packed training sequence (bin_id, bin_offset)."""
    import re

    from .textops import EN_STOPS
    n_b = _doc_buckets(sf_dir, n_buckets)
    tok_rx = re.compile(r"[A-Za-z0-9_]+")
    stop_rx = re.compile(r"[a-z]+")
    ws_rx = re.compile(r"[ \t\n\r]+")
    stops = set(EN_STOPS)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        import unicodedata
        ids, hs, nts = [], [], []
        for did, raw in zip(df["doc_id"], df["text"]):
            t = ws_rx.sub(" ", unicodedata.normalize("NFC", raw)).strip()
            toks = tok_rx.findall(t)
            if not toks:
                continue
            n = len(toks)
            mwl = sum(map(len, toks)) / n
            sf = sum(1 for w in stop_rx.findall(t.lower())
                     if w in stops) / n
            if n >= 30 and 3.8 <= mwl <= 5.1 and sf >= 0.04:
                ids.append(int(did))
                hs.append(hashlib.md5(t.encode("utf-8")).hexdigest())
                nts.append(len(words(t)))
        return pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "h": pd.array(hs, dtype=object),
            "nt": np.asarray(nts, dtype=np.int64),
            "bucket": (np.asarray([zlib.crc32(x.encode()) for x in hs],
                                  dtype=np.int64) % n_b)
            .astype(np.int32)})

    slim = _docs(sf_dir).map_batches(gate, batch_format="pandas")

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort") \
            .drop_duplicates("h", keep="first")
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "nt": g["nt"].to_numpy(np.int64)})

    kept = slim.groupby("bucket").map_groups(dedup,
                                             batch_format="pandas")

    # distributed prefix scan over the survivors (doc_pack_bins shape):
    # range-bucket by doc_id, P scalar totals to the driver, local fold
    max_id = int(_docs(sf_dir, columns=("doc_id",)).max("doc_id"))
    span = max_id + 1

    def rb(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return df.assign(rb=(ids * n_b // span).astype(np.int32))

    counts = kept.map_batches(rb, batch_format="pandas").materialize()
    totals = counts.groupby("rb").sum("nt").to_pandas().sort_values("rb")
    offs = np.zeros(n_b, dtype=np.int64)
    cum = 0
    for r, s in zip(totals["rb"], totals["sum(nt)"]):
        offs[int(r)] = cum
        cum += int(s)

    def fold(g: pd.DataFrame, _b=budget) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        nt = g["nt"].to_numpy(np.int64)
        prefix = np.cumsum(nt) - nt + offs[int(g["rb"].iloc[0])]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tokens": nt,
            "bin_id": prefix // _b,
            "bin_offset": prefix % _b})

    return counts.groupby("rb").map_groups(fold, batch_format="pandas")


def _stops_sql() -> str:
    from .textops import EN_STOPS, _sql_list
    return _sql_list(EN_STOPS)


CORPUS_BUILD_SQL = f"""
WITH norm AS (
  SELECT doc_id,
    trim(regexp_replace(nfc_normalize(text), '[ \t\n\r]+', ' ', 'g')) AS t
  FROM documents),
tq AS (
  SELECT doc_id, t, regexp_extract_all(t, '[A-Za-z0-9_]+') AS toks,
    len(list_filter(regexp_extract_all(lower(t), '[a-z]+'),
        x -> x IN ({_stops_sql()}))) AS nstop
  FROM norm),
m AS (
  SELECT doc_id, t, len(toks) AS n_toks,
    list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE
      / len(toks) AS mwl,
    nstop::DOUBLE / len(toks) AS sf
  FROM tq WHERE len(toks) > 0),
kept AS (
  SELECT doc_id, t FROM m
  WHERE n_toks >= 30 AND mwl >= 3.8 AND mwl <= 5.1 AND sf >= 0.04),
dedup AS (
  SELECT doc_id, t FROM kept
  QUALIFY row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) = 1),
n AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(t), '[a-z0-9]+')) AS nt
  FROM dedup),
p AS (
  SELECT doc_id, nt,
    COALESCE(sum(nt) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM n)
SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
  CAST(prefix // {_PACK_BUDGET} AS BIGINT) AS bin_id,
  CAST(prefix % {_PACK_BUDGET} AS BIGINT) AS bin_offset
FROM p
"""
