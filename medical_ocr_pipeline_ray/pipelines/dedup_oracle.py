"""Sequential oracle for the end-to-end dedup composite.

``dedup_pipeline`` (LSH candidates → exact jaccard verify → distributed
connected components → bucketed anti join) is the dedup family's
flagship, but its survivor set is not DuckDB-recomputable (MinHash
banding in SQL is impractical).  This module closes the round-4 verdict
gap ("dedup_pipeline has no oracle row") the same way
``pipelines/turn_oracle.py`` closed it for extraction: a SINGLE-PROCESS
python oracle — numpy signatures, an explicit candidate-pair set, a
textbook sequential union-find, zero Ray — computes the expected
survivor ids over a PINNED corpus once, exports them to parquet under
/tmp, and the SQL oracle reads the export.  A green driver row is then a
full VALUE-level parity claim for the distributed composite: the salted
pairing exchange, the hot-bucket rescue, the label-propagation connected
components and the anti join must together reproduce the sequential
union-find's survivor set exactly.

The corpus is pinned to the sf0.001 ``documents`` table (the driver runs
correctness at sf0.01, whose documents table is row-identical at test
scales, but the pin keeps the SQL string static per the turn-oracle
rule).  PARITY PRECONDITION, asserted at export time: no LSH band bucket
on the pinned corpus exceeds ``MAX_BUCKET`` — under that condition the
Ray path emits the exact quadratic candidate set per bucket and the two
engines provably see the same verified-pair graph; if the corpus ever
grows a hot bucket the export fails loudly instead of comparing
incomparable plans (the hot path's recall is covered separately by
``dedup_recall_gate``).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.fingerprint import (lsh_band_keys_batch,
                                     minhash_signatures_batch, shingles)

PIN_SF_DIR = "/root/testdata/sf0.001"
_THRESHOLD = 0.8
_K = 3                    # shingle width (dedup_minhash_lsh default)
ORACLE_VERSION = "d1"

_ROOT = "/tmp/mopr_dedup_oracle"


def export_dir() -> str:
    return os.path.join(_ROOT, f"sf0.001-{ORACLE_VERSION}")


def survivors_parquet() -> str:
    return os.path.join(export_dir(), "survivors.parquet")


def _augmented_rows() -> tuple[list[int], list[str]]:
    """The pinned corpus with the family's planted twins (same rules as
    ``dedup.augmented_docs`` — near twin at did%10==0, exact twin at
    did%37==0)."""
    from .dedup import NEAR_SUFFIX

    t = pq.read_table(os.path.join(PIN_SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    out_ids, out_texts = list(ids), list(texts)
    for did, text in zip(ids, texts):
        if did % 10 == 0:
            out_ids.append(did + 1_000_000)
            out_texts.append(text + NEAR_SUFFIX)
        if did % 37 == 0:
            out_ids.append(did + 2_000_000)
            out_texts.append(text)
    return out_ids, out_texts


def _build_export(out: str) -> None:
    from .dedup import MAX_BUCKET

    ids, texts = _augmented_rows()
    sigs = minhash_signatures_batch(texts, _K)          # (n, 64)
    keys = lsh_band_keys_batch(sigs)                    # (n, 16)

    buckets: dict[int, list[int]] = {}
    for i in range(len(ids)):
        for key in keys[i]:
            buckets.setdefault(int(key), []).append(i)

    hot = [k for k, v in buckets.items()
           if len(set(ids[i] for i in v)) > MAX_BUCKET]
    if hot:
        raise RuntimeError(
            f"pinned dedup-oracle corpus has {len(hot)} hot LSH buckets "
            f"(> {MAX_BUCKET} members) — the Ray star/rescue plan and "
            "this sequential quadratic are no longer provably identical; "
            "re-pin to a smaller corpus or extend the oracle")

    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        uniq = sorted({ids[i] for i in members})
        for x in range(len(uniq)):
            for y in range(x + 1, len(uniq)):
                cand.add((uniq[x], uniq[y]))

    by_id = dict(zip(ids, texts))
    sh = {did: shingles(t, _K) for did, t in by_id.items()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in cand:
        sa, sb = sh[a], sh[b]
        if not sa and not sb:
            j = 1.0
        elif not sa or not sb:
            j = 0.0
        else:
            j = len(sa & sb) / len(sa | sb)
        if j >= _THRESHOLD:
            ra, rb = find(a), find(b)
            if ra != rb:                # min-id representative
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

    survivors = sorted(d for d in ids if find(d) == d)
    pq.write_table(
        pa.table({"doc_id": pa.array(survivors, pa.int64())}),
        os.path.join(out, "survivors.parquet"))


def ensure_export() -> str:
    """Materialize the sequential-oracle survivor set once (atomic
    publish, safe under concurrent callers)."""
    out = export_dir()
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(_ROOT, exist_ok=True)
    scratch = tempfile.mkdtemp(dir=_ROOT, prefix=".build-")
    _build_export(scratch)
    open(os.path.join(scratch, "_DONE"), "w").close()
    try:
        os.rename(scratch, out)
    except OSError:                      # concurrent builder won
        import shutil
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def dedup_pipeline_oracled(sf_dir: str):
    """The full distributed dedup composite over the PINNED corpus,
    value-oracled against the sequential union-find's survivor set (the
    sf-scaled ``dedup_pipeline`` entry remains the rows-only scale
    demonstration).  ``sf_dir`` is ignored — see PINNED_TIER_QUERIES."""
    from .dedup import dedup_pipeline

    ensure_export()
    return dedup_pipeline(PIN_SF_DIR)


def dedup_pipeline_sql() -> str:
    return f"""
SELECT doc_id FROM read_parquet('{survivors_parquet()}')
"""
