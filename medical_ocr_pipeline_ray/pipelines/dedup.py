"""Corpus-scale deduplication operators over the ``documents`` table.

The reference's dedup is page-local (greedy bbox+text matching, D1 —
notebooks/01_extract_blocks.ipynb:~207 ``deduplicate``; exact list-union
dedup D2 in notebooks/05_merge_and_validate.ipynb:~52).  At 100 TB a
training-data engine needs corpus-level dedup; these operators implement
the standard public constructions on Ray Data:

- ``dedup_exact``       — content-hash partition + per-group min
  (hash shuffle moves (hash, doc_id) pairs only).
- ``dedup_minhash_lsh`` — shingle → MinHash(64) → 16×4 banded LSH →
  ``groupby(band_key)`` candidate pairs → exact Jaccard verify.
- ``dedup_simhash``     — SimHash64 → 4×16-bit chunk blocking (a pair
  within Hamming distance ≤4 of 64 bits must share at least one of 4
  chunks; we verify ≤ ``max_hamming``) → Hamming verify.
- ``dedup_ngram_jaccard`` — deterministic length-bucket blocking (bucket
  and bucket+1 overlap) → exact word-bigram Jaccard verify.

Since the testdata ``documents`` table has no natural duplicates, each
operator runs over the AUGMENTED corpus: every ``doc_id % 10 == 0``
document gains a near-duplicate twin (``doc_id + 1_000_000``, a few words
appended) and every ``doc_id % 37 == 0`` an exact twin
(``doc_id + 2_000_000``) — derived deterministically in-pipeline, no
external data.

Scale notes: candidate verification here broadcasts the doc texts
(``ray.put``) because the corpus is small; at 100 TB the verify stage is a
partitioned hash join of candidate pairs against the corpus on doc_id —
the band/bucket shuffles already move only (key, doc_id) pairs, never
payloads.  Hot LSH buckets are capped (``MAX_BUCKET``) and logged, the
standard salting guard for degenerate keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..functions.fingerprint import (hamming64, jaccard, lsh_band_keys,
                                     minhash_signature, simhash64)
from ..functions.textstats import exact_hash

MAX_BUCKET = 64
NEAR_SUFFIX = " near duplicate copy appended marker words"


def augmented_docs(sf_dir: str):
    """documents ∪ deterministic near/exact twins (one batch map)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ids = list(df["doc_id"])
        texts = list(df["text"])
        for did, t in zip(df["doc_id"], df["text"]):
            if did % 10 == 0:
                ids.append(did + 1_000_000)
                texts.append(t + NEAR_SUFFIX)
            if did % 37 == 0:
                ids.append(did + 2_000_000)
                texts.append(t)
        return pd.DataFrame({"doc_id": ids, "text": texts})

    return ds.map_batches(expand, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact dedup (SQL oracle on the raw documents table)
# ---------------------------------------------------------------------------

def dedup_exact(sf_dir: str):
    """Per content hash: representative doc (min id) + copy count.
    Hash-partition + per-group aggregate; only (hash, doc_id) shuffles."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "text_hash": [exact_hash(t) for t in df["text"]],
            "doc_id": df["doc_id"].to_numpy()})

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_copies"))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# candidate-pair frameworks (shared plumbing)
# ---------------------------------------------------------------------------

def _pairs_from_buckets(keyed, key_col: str, max_bucket: int = MAX_BUCKET):
    """bucket rows (key, doc_id) → unique candidate pairs (doc_a < doc_b)."""
    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.array(sorted(set(int(x) for x in g["doc_id"])),
                       dtype=np.int64)
        if len(ids) < 2 or len(ids) > max_bucket:
            # degenerate/hot bucket: skip — the salting path for hot keys
            # would split the bucket at scale
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    # NOTE: a pair can surface from several buckets.  Deduping 10^5+
    # candidate keys through a groupby costs far more than verifying the
    # duplicates (measured 45 s vs 2 s at sf0.01), so candidates flow to
    # the verifier as-is and the (tiny, deterministic) VERIFIED result is
    # deduped instead — see _dedupe_pairs.
    return keyed.groupby(key_col).map_groups(emit_pairs,
                                             batch_format="pandas")


def _dedupe_pairs(verified):
    """Drop duplicate verified pairs (same pair found via several buckets).
    The verified set is orders of magnitude smaller than the candidate
    set, so this groupby is trivial."""
    return verified.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


class _PairVerifier:
    """Actor: doc texts broadcast once; verifies each candidate pair with
    the exact similarity function (Jaccard / Hamming)."""

    def __init__(self, texts_ref, mode: str, k: int, threshold: float):
        self.texts: dict[int, str] = ray.get(texts_ref)
        self.mode = mode
        self.k = k
        self.threshold = threshold
        self._shingle_cache: dict[int, frozenset] = {}
        self._simhash_cache: dict[int, int] = {}

    def _shingles(self, did: int):
        s = self._shingle_cache.get(did)
        if s is None:
            from ..functions.fingerprint import shingles
            s = frozenset(shingles(self.texts[did], self.k))
            self._shingle_cache[did] = s
        return s

    def _simhash(self, did: int) -> int:
        h = self._simhash_cache.get(did)
        if h is None:
            h = simhash64(self.texts[did])
            self._simhash_cache[did] = h
        return h

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_s = [], [], []
        for a, b in zip(df["doc_a"], df["doc_b"]):
            a, b = int(a), int(b)
            if a not in self.texts or b not in self.texts:
                continue
            if self.mode == "jaccard":
                sa, sb = self._shingles(a), self._shingles(b)
                if not sa and not sb:
                    s = 1.0
                elif not sa or not sb:
                    s = 0.0
                else:
                    s = len(sa & sb) / len(sa | sb)
                ok = s >= self.threshold
            else:  # hamming on simhash
                s = float(hamming64(self._simhash(a), self._simhash(b)))
                ok = s <= self.threshold
            if ok:
                out_a.append(int(a))
                out_b.append(int(b))
                out_s.append(round(float(s), 6))
        return pd.DataFrame({
            "doc_a": np.array(out_a, dtype=np.int64),
            "doc_b": np.array(out_b, dtype=np.int64),
            "similarity": np.array(out_s, dtype=np.float64)})


def _texts_ref(sf_dir: str):
    df = augmented_docs(sf_dir).to_pandas()
    return ray.put(dict(zip(df["doc_id"].astype(int), df["text"])))


# ---------------------------------------------------------------------------
# MinHash + banded LSH near-dedup
# ---------------------------------------------------------------------------

def dedup_minhash_lsh(sf_dir: str, threshold: float = 0.8, k: int = 3):
    aug = augmented_docs(sf_dir)

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        ids, keys = [], []
        for did, t in zip(df["doc_id"], df["text"]):
            for bk in lsh_band_keys(minhash_signature(t, k)):
                ids.append(int(did))
                keys.append(bk)
        return pd.DataFrame({"band_key": keys,
                             "doc_id": np.array(ids, dtype=np.int64)})

    keyed = aug.map_batches(bands, batch_format="pandas")
    cands = _pairs_from_buckets(keyed, "band_key")
    tref = _texts_ref(sf_dir)
    verified = cands.map_batches(
        _PairVerifier, batch_format="pandas", concurrency=(1, 4),
        fn_constructor_kwargs={"texts_ref": tref, "mode": "jaccard",
                               "k": k, "threshold": threshold})
    return _dedupe_pairs(verified)


# ---------------------------------------------------------------------------
# SimHash near-dedup (chunk blocking + Hamming verify)
# ---------------------------------------------------------------------------

def dedup_simhash(sf_dir: str, max_hamming: int = 6):
    aug = augmented_docs(sf_dir)

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        ids, keys = [], []
        for did, t in zip(df["doc_id"], df["text"]):
            h = simhash64(t)
            for c in range(4):
                ids.append(int(did))
                keys.append(f"{c}:{(h >> (16 * c)) & 0xFFFF:04x}")
        return pd.DataFrame({"chunk_key": keys,
                             "doc_id": np.array(ids, dtype=np.int64)})

    keyed = aug.map_batches(chunks, batch_format="pandas")
    cands = _pairs_from_buckets(keyed, "chunk_key")
    tref = _texts_ref(sf_dir)
    return _dedupe_pairs(cands.map_batches(
        _PairVerifier, batch_format="pandas", concurrency=(1, 4),
        fn_constructor_kwargs={"texts_ref": tref, "mode": "hamming",
                               "k": 1, "threshold": float(max_hamming)}))


# ---------------------------------------------------------------------------
# word-bigram Jaccard near-dedup (deterministic length-bucket blocking)
# ---------------------------------------------------------------------------

def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.8, k: int = 2,
                        bucket_width: int = 16):
    aug = augmented_docs(sf_dir)

    def buckets(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.fingerprint import words
        ids, keys = [], []
        for did, t in zip(df["doc_id"], df["text"]):
            b = len(words(t)) // bucket_width
            for probe in (b, b + 1):   # overlap so near-equal lengths meet
                ids.append(int(did))
                keys.append(probe)
        return pd.DataFrame({"len_bucket": np.array(keys, dtype=np.int64),
                             "doc_id": np.array(ids, dtype=np.int64)})

    keyed = aug.map_batches(buckets, batch_format="pandas")
    # length blocking is the quadratic-within-block BASELINE variant (the
    # LSH operators are the scale path) → allow big buckets here
    cands = _pairs_from_buckets(keyed, "len_bucket", max_bucket=4096)
    tref = _texts_ref(sf_dir)
    return _dedupe_pairs(cands.map_batches(
        _PairVerifier, batch_format="pandas", concurrency=(1, 4),
        fn_constructor_kwargs={"texts_ref": tref, "mode": "jaccard",
                               "k": k, "threshold": threshold}))
