"""Similarity search over the ``embeddings`` table (list<float> column).

- ``knn_brute_force`` — exact cosine top-k: query vector broadcast via
  ``ray.put``, per-batch numpy matmul (vectorized), global
  ``sort(desc).limit(k)``.  DuckDB oracle via ``list_cosine_similarity``
  (embeddings cast to DOUBLE on both sides so ordering agrees).
- ``knn_lsh`` — the scale path: random-hyperplane LSH buckets; only
  buckets within Hamming distance ``probe`` of the query's bucket are
  scanned.  Approximate → verified against brute force by recall in tests
  (rows-only for the driver).
- ``knn_ivf`` / ``knn_ivf_pruned`` — coarse-quantization ANN; the pruned
  variant reads ONLY the query's nprobe cells of a cell-partitioned
  layout (``build_ivf_layout``) — the IO win IVF exists for.
- ``knn_range_search`` — radius query (all vectors with cosine ≥ thr).
- ``embedding_near_dup`` — embedding-cosine near-duplicate pairs over an
  augmented corpus (planted perturbed twins): slim LSH-bucket shuffle,
  star-paired hot buckets, id-keyed partitioned vector attach, exact
  cosine verify (round-3 shape — see ``near_dup_pairs``).

All stages are numpy-vectorized per batch; nothing materializes the full
table except the final top-k (k rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray
import ray.data as rd

_PLANES_SEED = 1234


def _emb_matrix(df: pd.DataFrame) -> np.ndarray:
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def _query_vec(sf_dir: str) -> np.ndarray:
    """The min-vec_id embedding as the query vector — two PRUNED reads
    (id column scan, then a row-filtered single-row fetch), never the
    whole vector corpus on the driver."""
    path = f"{sf_dir}/embeddings.parquet"
    ids = pq.read_table(path, columns=["vec_id"])["vec_id"]
    qid = int(np.asarray(ids).min())
    row = pq.read_table(path, columns=["embedding"],
                        filters=[("vec_id", "==", qid)])
    return np.asarray(row["embedding"][0].as_py(), dtype=np.float64)


def knn_brute_force(sf_dir: str, k: int = 10):
    q = _query_vec(sf_dir)
    qn = np.linalg.norm(q)
    qref = ray.put(q)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def score(df: pd.DataFrame, _qref=qref, _qn=qn) -> pd.DataFrame:
        e = _emb_matrix(df)
        qv = ray.get(_qref)
        sims = (e @ qv) / (np.linalg.norm(e, axis=1) * _qn)
        return pd.DataFrame({"vec_id": df["vec_id"].to_numpy(),
                             "cosine": sims})

    scored = ds.map_batches(score, batch_format="pandas")
    from .relational import local_topk
    top = local_topk(scored, ["cosine", "vec_id"],
                     [True, False], k).to_pandas()
    top = top.reset_index(drop=True)
    return pd.DataFrame({
        "rank": np.arange(1, len(top) + 1, dtype=np.int64),
        "vec_id": top["vec_id"].astype(np.int64)})


KNN_SQL = """
SELECT CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
            WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) DESC,
         vec_id) AS BIGINT) AS rank,
       vec_id
FROM embeddings
QUALIFY rank <= 10
"""


def _bucket_bits(e: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket ids (uint32) for rows of e."""
    bits = (e @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) @ weights).astype(np.uint64)


def _planes(dim: int, n_planes: int = 12) -> np.ndarray:
    rng = np.random.RandomState(_PLANES_SEED)
    return rng.standard_normal((n_planes, dim))


def knn_lsh(sf_dir: str, k: int = 10, n_planes: int = 8, probe_hamming: int = 3):
    """Approximate top-k: scan only vectors whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (~35% of the corpus at the
    defaults; recall ~0.6-0.7 on random gaussian embeddings — the hardest
    case for ANN, since true neighbors are barely correlated)."""
    q = _query_vec(sf_dir)
    planes = _planes(q.shape[0], n_planes)
    qbucket = int(_bucket_bits(q[None, :], planes)[0])
    qn = np.linalg.norm(q)
    qref = ray.put((q, planes))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def score(df: pd.DataFrame, _ref=qref, _qb=qbucket, _qn=qn,
              _probe=probe_hamming) -> pd.DataFrame:
        qv, pl = ray.get(_ref)
        e = _emb_matrix(df)
        buckets = _bucket_bits(e, pl)
        ham = np.array([bin(int(b) ^ _qb).count("1") for b in buckets])
        mask = ham <= _probe
        if not mask.any():
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        e = e[mask]
        sims = (e @ qv) / (np.linalg.norm(e, axis=1) * _qn)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy()[mask].astype(np.int64),
            "cosine": sims})

    scored = ds.map_batches(score, batch_format="pandas")
    from .relational import local_topk
    top = (local_topk(scored, ["cosine", "vec_id"], [True, False], k)
           .to_pandas().reset_index(drop=True))
    return pd.DataFrame({
        "rank": np.arange(1, len(top) + 1, dtype=np.int64),
        "vec_id": top["vec_id"].astype(np.int64)})


def augmented_embeddings(sf_dir: str):
    """embeddings ∪ planted perturbed twins (vec_id+1_000_000, deterministic
    per-vector noise) for the near-dup operator."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ids = list(df["vec_id"].astype(np.int64))
        vecs = [np.asarray(v, dtype=np.float64) for v in df["embedding"]]
        for vid, v in zip(df["vec_id"].astype(np.int64), df["embedding"]):
            if vid % 25 == 0:
                rng = np.random.RandomState(int(vid) + 7)
                noise = rng.standard_normal(len(v)) * 0.01
                ids.append(int(vid) + 1_000_000)
                vecs.append(np.asarray(v, dtype=np.float64) + noise)
        return pd.DataFrame({"vec_id": np.array(ids, dtype=np.int64),
                             "embedding": vecs})

    return ds.map_batches(expand, batch_format="pandas")


def _attach_vec(cands, corpus, which: str, n_buckets: int):
    """Partitioned hash join attaching the corpus EMBEDDING for one side
    of each candidate pair (the dedup._attach_text pattern on vectors):
    pairs bucketed on ``vec_<which> % P``, corpus on ``vec_id % P``,
    matched inside ``map_groups`` with a bucket-local dict — embeddings
    never ride the candidate-pair groupby and are shipped exactly once
    per bucket.  Vectors travel as raw float64 BYTES (plain binary
    columns): mixed ndarray/None object columns trip Ray's pandas tensor
    extension when empty and non-empty blocks concatenate.  The first attach (which='a') also dedups pair copies
    surfacing from multiple LSH buckets (all copies share vec_a → same
    bucket)."""
    id_col = "vec_a" if which == "a" else "vec_b"
    out_col = f"emb_{which}"
    carry = "emb_a" if which == "b" else None
    dedupe_pairs = which == "a"

    def key_cand(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df[id_col].astype(np.int64) % n_buckets)
            .astype(np.int32),
            "jkey": df[id_col].astype(np.int64),
            "vec_a": df["vec_a"].astype(np.int64),
            "vec_b": df["vec_b"].astype(np.int64),
            "carry": (df[carry].astype(object) if carry else
                      np.full(len(df), b"", dtype=object)),
            "jvec": np.full(len(df), b"", dtype=object),
            "side": np.zeros(len(df), dtype=np.int8)})

    def key_corpus(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["vec_id"].astype(np.int64) % n_buckets)
            .astype(np.int32),
            "jkey": df["vec_id"].astype(np.int64),
            "vec_a": np.full(len(df), -1, dtype=np.int64),
            "vec_b": np.full(len(df), -1, dtype=np.int64),
            "carry": np.full(len(df), b"", dtype=object),
            "jvec": pd.Series(
                [np.asarray(v, dtype=np.float64).tobytes()
                 for v in df["embedding"]],
                dtype=object, index=df.index),
            "side": np.ones(len(df), dtype=np.int8)})

    both = cands.map_batches(key_cand, batch_format="pandas").union(
        corpus.map_batches(key_corpus, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        corp = g[g["side"] == 1]
        lookup = dict(zip(corp["jkey"], corp["jvec"]))
        c = g[g["side"] == 0]
        if dedupe_pairs and len(c):
            c = c.sort_values(["vec_a", "vec_b"], kind="mergesort") \
                .drop_duplicates(["vec_a", "vec_b"])
        attached = c["jkey"].map(lookup)
        keep = attached.notna()
        c = c[keep]
        out = {"vec_a": c["vec_a"].to_numpy(),
               "vec_b": c["vec_b"].to_numpy()}
        if carry:
            out["emb_a"] = c["carry"].to_numpy()
        out[out_col] = attached[keep].to_numpy()
        f = pd.DataFrame(out)
        for col in ("emb_a", out_col):
            if col in f:
                f[col] = f[col].astype(object)
        return f

    return both.groupby("bucket").map_groups(join_bucket,
                                             batch_format="pandas")


def near_dup_pairs(aug, threshold: float, n_planes: int, dim: int,
                   n_buckets: int | None = None,
                   max_bucket: int | None = None):
    """LSH-bucket candidates + id-keyed vector attach + exact cosine
    verify over an arbitrary (vec_id, embedding) Dataset.

    Scale shape (round-3 rewrite; round-2 carried embeddings through the
    bucket groupby and ran an UNCAPPED per-bucket quadratic):
    - the bucket shuffle moves (bucket, vec_id) pairs only;
    - hot buckets (> max_bucket members — a degenerate low-entropy
      embedding region) STAR-pair against the min-id representative via
      ``dedup._pairs_from_buckets`` — linear cost, every member still
      linked (see that helper's single-cluster assumption note);
    - embeddings are attached per side by a partitioned hash join
      (``_attach_vec``) and the exact cosine check is a stateless
      vectorized row map."""
    from ..partitioning import buckets_for
    from .dedup import MAX_BUCKET, _pairs_from_buckets

    n_buckets = n_buckets or buckets_for()
    max_bucket = max_bucket or MAX_BUCKET
    planes = _planes(dim, n_planes)
    pref = ray.put(planes)

    def bucketize(df: pd.DataFrame, _pref=pref) -> pd.DataFrame:
        pl = ray.get(_pref)
        e = _emb_matrix(df)
        return pd.DataFrame({
            "bucket": _bucket_bits(e, pl).astype(np.int64),
            "doc_id": df["vec_id"].astype(np.int64)})

    keyed = aug.map_batches(bucketize, batch_format="pandas")
    cands = _pairs_from_buckets(keyed, "bucket", max_bucket=max_bucket) \
        .map_batches(lambda df: df.rename(
            columns={"doc_a": "vec_a", "doc_b": "vec_b"}),
            batch_format="pandas")

    with_a = _attach_vec(cands, aug, "a", n_buckets)
    with_ab = _attach_vec(with_a, aug, "b", n_buckets)

    def verify(df: pd.DataFrame, _thr=threshold) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"vec_a": pd.Series([], dtype=np.int64),
                                 "vec_b": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        a = np.stack([np.frombuffer(v, dtype=np.float64)
                      for v in df["emb_a"]])
        b = np.stack([np.frombuffer(v, dtype=np.float64)
                      for v in df["emb_b"]])
        sims = np.einsum("ij,ij->i", a, b) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
        keep = sims >= _thr
        return pd.DataFrame({
            "vec_a": df["vec_a"].to_numpy()[keep].astype(np.int64),
            "vec_b": df["vec_b"].to_numpy()[keep].astype(np.int64),
            "cosine": np.round(sims[keep], 6)})

    return with_ab.map_batches(verify, batch_format="pandas")


def embedding_near_dup(sf_dir: str, threshold: float = 0.99,
                       n_planes: int = 10):
    """Cosine near-duplicate pairs over the augmented corpus (planted
    perturbed twins): LSH-bucket candidates + exact cosine verify.  A
    perturbed twin lands in the same bucket with high probability; pairs
    emitted as (vec_a < vec_b, cosine).  See ``near_dup_pairs`` for the
    scale design (slim bucket shuffle, star-paired hot buckets,
    partitioned vector attach)."""
    from ..partitioning import buckets_for, table_bytes
    aug = augmented_embeddings(sf_dir)
    dim = _query_vec(sf_dir).shape[0]
    return near_dup_pairs(
        aug, threshold, n_planes, dim,
        n_buckets=buckets_for(table_bytes(sf_dir, "embeddings")))


def _ivf_centroids(sf_dir: str, n_centroids: int = 16,
                   n_iters: int = 5, sample: int = 512) -> np.ndarray:
    """Deterministic coarse centroids: fixed-iteration Lloyd k-means over
    a PRUNED sample of the corpus (first ``sample`` vec_ids — a row-group
    read, never the full table).  Seeded init from evenly-spaced sample
    rows; empty clusters keep their previous centroid."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "<", sample)])
    x = np.stack([np.asarray(v, dtype=np.float64)
                  for v in tbl["embedding"].to_pylist()])
    idx = np.linspace(0, len(x) - 1, n_centroids).astype(int)
    cents = x[idx].copy()
    for _ in range(n_iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return cents


def knn_ivf(sf_dir: str, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4):
    """IVF-style approximate top-k (the brief's named scale path): coarse
    centroids trained once on a pruned sample and broadcast via
    ``ray.put``; each batch assigns its vectors to the nearest centroid
    and scores ONLY vectors falling in the query's ``nprobe`` nearest
    cells (~nprobe/n_centroids of the corpus scanned).  Per-batch local
    top-k + small merge; recall vs brute force asserted in tests."""
    q = _query_vec(sf_dir)
    cents = _ivf_centroids(sf_dir, n_centroids)
    qd = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe_cells = set(int(i) for i in np.argsort(qd)[:nprobe])
    qn = np.linalg.norm(q)
    ref = ray.put((q, cents))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def score(df: pd.DataFrame, _ref=ref, _cells=probe_cells,
              _qn=qn) -> pd.DataFrame:
        qv, cs = ray.get(_ref)
        e = _emb_matrix(df)
        d = ((e[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mask = np.isin(assign, list(_cells))
        if not mask.any():
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        e = e[mask]
        sims = (e @ qv) / (np.linalg.norm(e, axis=1) * _qn)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy()[mask].astype(np.int64),
            "cosine": sims})

    from .relational import local_topk
    scored = ds.map_batches(score, batch_format="pandas")
    top = (local_topk(scored, ["cosine", "vec_id"], [True, False], k)
           .to_pandas().reset_index(drop=True))
    return pd.DataFrame({
        "rank": np.arange(1, len(top) + 1, dtype=np.int64),
        "vec_id": top["vec_id"].astype(np.int64)})


def knn_range_search(sf_dir: str, threshold: float = 0.2):
    """RANGE similarity query: every vector with cosine(query, v) >=
    ``threshold`` (the radius-search companion to top-k).  Per-batch
    vectorized matmul against the broadcast query, batch-local filter —
    embarrassingly parallel, no shuffle, result bounded by the matching
    set.  Emits vec_id only: the driver's DuckDB oracle recomputes the
    cosine with a different summation order (list_cosine_similarity), so
    MEMBERSHIP at a threshold far from any sample is engine-stable while
    raw cosine bits are not."""
    q = _query_vec(sf_dir)
    qn = np.linalg.norm(q)
    qref = ray.put(q)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def in_range(df: pd.DataFrame, _qref=qref, _qn=qn,
                 _thr=threshold) -> pd.DataFrame:
        e = _emb_matrix(df)
        qv = ray.get(_qref)
        sims = (e @ qv) / (np.linalg.norm(e, axis=1) * _qn)
        keep = sims >= _thr
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy()[keep].astype(np.int64)})

    return ds.map_batches(in_range, batch_format="pandas")


KNN_RANGE_SQL = """
SELECT vec_id FROM embeddings
WHERE list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
         WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) >= 0.2
"""


def build_ivf_layout(sf_dir: str, layout_dir: str,
                     n_centroids: int = 16) -> str:
    """Write the embeddings corpus PARTITIONED BY IVF CELL (hive layout
    ``cell=<k>/``) — the physical layout that turns IVF from
    compute-pruned into READ-pruned: a query then opens only its
    ``nprobe`` cell directories and the other ~(1 - nprobe/K) of the
    corpus never leaves storage.  One streaming pass: per-batch nearest-
    centroid assignment (centroids broadcast) + partitioned write.
    Embeddings ride as fixed-dim float64 lists."""
    import os

    cents = _ivf_centroids(sf_dir, n_centroids)
    cref = ray.put(cents)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def assign(df: pd.DataFrame, _cref=cref) -> pd.DataFrame:
        cs = ray.get(_cref)
        e = _emb_matrix(df)
        d = ((e[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
        return pd.DataFrame({
            "cell": d.argmin(axis=1).astype(np.int32),
            "vec_id": df["vec_id"].astype(np.int64),
            "embedding": [row.tolist() for row in e]})

    ds.map_batches(assign, batch_format="pandas") \
        .write_parquet(layout_dir, partition_cols=["cell"],
                       compression="zstd")
    return layout_dir


def _ivf_layout_cached(sf_dir: str, n_centroids: int) -> str:
    """Build (or reuse) the cell-partitioned layout under /tmp — the
    at-scale equivalent is a one-time corpus re-layout job.

    The cache tag includes the source parquet's (size, mtime_ns) so a
    regenerated embeddings.parquet invalidates the layout instead of
    silently serving stale cells, and the ``_done`` marker is written
    atomically (tempfile + rename) so a concurrent builder either sees a
    complete layout or none."""
    import hashlib as _h
    import os
    import tempfile
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = _h.md5(f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:"
                 f"{n_centroids}".encode()).hexdigest()[:12]
    layout = f"/tmp/mopr_ivf/{tag}"
    marker = os.path.join(layout, "_done")
    if not os.path.exists(marker):
        # build into a process-private dir, then publish the whole layout
        # with one atomic rename — a concurrent builder either wins the
        # rename or discards its scratch copy; readers only ever see a
        # complete layout
        os.makedirs("/tmp/mopr_ivf", exist_ok=True)
        scratch = tempfile.mkdtemp(dir="/tmp/mopr_ivf",
                                   prefix=f".build-{tag}-")
        build_ivf_layout(sf_dir, scratch, n_centroids)
        open(os.path.join(scratch, "_done"), "w").close()
        try:
            os.rename(scratch, layout)
        except OSError:        # another process published first
            import shutil
            shutil.rmtree(scratch, ignore_errors=True)
    return layout


def knn_ivf_pruned(sf_dir: str, k: int = 10, n_centroids: int = 16,
                   nprobe: int = 4):
    """READ-pruned IVF top-k: identical result to ``knn_ivf`` (same
    centroids, same probe cells) but the scan opens ONLY the query's
    ``nprobe`` cell partitions of the cell-partitioned layout — fragment
    count read < total fragments (asserted in tests).  The per-batch
    work is a pure cosine scan: cell membership was decided at layout
    time, so no assignment matmul on the read path either."""
    import glob
    import os

    q = _query_vec(sf_dir)
    cents = _ivf_centroids(sf_dir, n_centroids)
    qd = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe_cells = [int(i) for i in np.argsort(qd)[:nprobe]]
    layout = _ivf_layout_cached(sf_dir, n_centroids)
    # partition pruning: only the probe cells' directories are listed
    paths = [p for c in probe_cells
             for p in sorted(glob.glob(os.path.join(layout,
                                                    f"cell={c}", "*")))]
    if not paths:
        return pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                             "vec_id": pd.Series([], dtype=np.int64)})
    qn = np.linalg.norm(q)
    qref = ray.put(q)
    ds = rd.read_parquet(paths, columns=["vec_id", "embedding"])

    def score(df: pd.DataFrame, _qref=qref, _qn=qn) -> pd.DataFrame:
        e = _emb_matrix(df)
        qv = ray.get(_qref)
        sims = (e @ qv) / (np.linalg.norm(e, axis=1) * _qn)
        return pd.DataFrame({"vec_id": df["vec_id"].astype(np.int64),
                             "cosine": sims})

    from .relational import local_topk
    scored = ds.map_batches(score, batch_format="pandas")
    top = (local_topk(scored, ["cosine", "vec_id"], [True, False], k)
           .to_pandas().reset_index(drop=True))
    return pd.DataFrame({
        "rank": np.arange(1, len(top) + 1, dtype=np.int64),
        "vec_id": top["vec_id"].astype(np.int64)})


# ---------------------------------------------------------------------------
# per-label centroids (k-means E-step / nearest-centroid classifier prep)
# ---------------------------------------------------------------------------

def embedding_label_centroids(sf_dir: str):
    """Per-label embedding centroids over the labeled corpus — the
    distributed k-means assignment-step shape and the nearest-centroid
    classifier's training pass.  Per-batch partials carry (label, count,
    float64 sum-vector bytes): label cardinality is small and bounded,
    so the partial set is tiny (n_blocks × n_labels rows) and finishes
    locally — the vector corpus itself never shuffles.  Output is
    long-format (label, dim, centroid) rounded to 6 dp: both engines sum
    the same float set in different orders, and 1e-6 agreement is the
    repo's float contract (same as the kNN cosine rounding)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        e = _emb_matrix(df)
        lab = df["label"].to_numpy().astype(np.int64)
        labs, ns, sums = [], [], []
        for lv in np.unique(lab):
            m = lab == lv
            labs.append(int(lv))
            ns.append(int(m.sum()))
            sums.append(e[m].sum(axis=0).tobytes())
        return pd.DataFrame({
            "label": np.array(labs, dtype=np.int64),
            "n": np.array(ns, dtype=np.int64),
            "vsum": pd.Series(sums, dtype=object)})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rows = []
    for lv, g in parts.groupby("label"):
        s = np.sum([np.frombuffer(b, dtype=np.float64) for b in g["vsum"]],
                   axis=0)
        c = np.round(s / int(g["n"].sum()), 6)
        rows.extend((int(lv), d, float(v))
                    for d, v in enumerate(c, start=1))
    out = pd.DataFrame(rows, columns=["label", "dim", "centroid"])
    out["label"] = out["label"].astype(np.int64)
    out["dim"] = out["dim"].astype(np.int64)
    return out


LABEL_CENTROIDS_SQL = """
WITH e AS (
  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
         unnest(generate_series(1, len(embedding))) AS dim
  FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       round(avg(v), 6) AS centroid
FROM e GROUP BY label, dim
"""


def knn_label_predict(sf_dir: str, k: int = 10):
    """k-NN majority-vote classification of the query vector over the
    labeled corpus — brute-force scoring (same scale shape as
    ``knn_brute_force``: vectorized per-batch matmul against the
    broadcast query, ``local_topk`` merge), then a trivial local vote
    over the k survivors.  Ties break to the smaller label, cosine ties
    to the smaller vec_id — deterministic on both engines."""
    q = _query_vec(sf_dir)
    qn = np.linalg.norm(q)
    qref = ray.put(q)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def score(df: pd.DataFrame, _qref=qref, _qn=qn) -> pd.DataFrame:
        e = _emb_matrix(df)
        qv = ray.get(_qref)
        sims = (e @ qv) / (np.linalg.norm(e, axis=1) * _qn)
        return pd.DataFrame({"vec_id": df["vec_id"].to_numpy(),
                             "label": df["label"].to_numpy()
                             .astype(np.int64),
                             "cosine": sims})

    from .relational import local_topk
    top = local_topk(ds.map_batches(score, batch_format="pandas"),
                     ["cosine", "vec_id"], [True, False], k).to_pandas()
    votes = top.groupby("label", as_index=False).size() \
        .sort_values(["size", "label"], ascending=[False, True])
    return pd.DataFrame({
        "pred_label": np.array([votes["label"].iloc[0]], dtype=np.int64),
        "n_votes": np.array([votes["size"].iloc[0]], dtype=np.int64)})


KNN_LABEL_PREDICT_SQL = """
WITH top AS (
  SELECT label,
         row_number() OVER (
           ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
              WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) DESC,
           vec_id) AS rank
  FROM embeddings
  QUALIFY rank <= 10)
SELECT CAST(label AS BIGINT) AS pred_label,
       CAST(count(*) AS BIGINT) AS n_votes
FROM top GROUP BY label
ORDER BY n_votes DESC, pred_label LIMIT 1
"""


def knn_recall_gate(sf_dir: str, k: int = 10,
                    min_recall_lsh: float = 0.5,
                    min_recall_ivf: float = 0.3):
    """The ANN family's accuracy claim as a driver-oracled row (the
    sketch tolerance-gate pattern applied to retrieval): the exact
    brute-force top-k PLUS per-approximate-index recall@k flags.  The
    SQL oracle recomputes the exact top-k and asserts every flag TRUE —
    an index whose recall drifts under its verified floor turns the
    driver row red instead of passing silently behind a pytest
    threshold.  Floors match each index's documented claim on random
    gaussian corpora (the ADVERSARIAL case for ANN — true neighbors
    barely correlated): hyperplane LSH ≥ 0.5, IVF nprobe/K = 1/4 of the
    corpus ≥ 0.3; real-embedding clustered corpora sit far higher."""
    brute = knn_brute_force(sf_dir, k)
    exact = set(int(v) for v in brute["vec_id"])

    def ok(approx_df, floor: float) -> bool:
        got = set(int(v) for v in approx_df["vec_id"])
        return len(got & exact) / float(k) >= floor

    lsh_ok = ok(knn_lsh(sf_dir, k), min_recall_lsh)
    ivf_ok = ok(knn_ivf(sf_dir, k), min_recall_ivf)
    pruned_ok = ok(knn_ivf_pruned(sf_dir, k), min_recall_ivf)
    out = brute.copy()
    out["lsh_recall_ok"] = bool(lsh_ok)
    out["ivf_recall_ok"] = bool(ivf_ok)
    out["ivf_pruned_recall_ok"] = bool(pruned_ok)
    return out


KNN_RECALL_GATE_SQL = """
SELECT CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
            WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) DESC,
         vec_id) AS BIGINT) AS rank,
       vec_id,
       TRUE AS lsh_recall_ok,
       TRUE AS ivf_recall_ok,
       TRUE AS ivf_pruned_recall_ok
FROM embeddings
QUALIFY rank <= 10
"""


# ---------------------------------------------------------------------------
# Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
# embedding space, then drop near-identical vectors WITHIN each cluster,
# keeping one representative per duplicate group.  The published design
# is exactly this engine's shape — the cross-cluster problem never
# materializes because the k-means step bounds each cluster, and the
# within-cluster pairwise pass is local to one task.  Here the
# ``label`` column stands in for the k-means assignment (the assignment
# machinery itself is ``embedding_label_centroids``); twins are planted
# SQL-reproducibly — an exact copy (vec_id+1M, vid%25==0) and a
# doubled vector (vec_id+2M, vid%37==0; scaling preserves cosine
# exactly) — so the DuckDB oracle rebuilds the same augmented corpus
# with ``list_transform`` and recomputes the survivor set via a
# recursive-CTE transitive closure.  Decision parity note: both engines
# compare float64 cosine to 0.95, and the corpus decision margin is
# enormous (max natural within-label cosine 0.475 at sf0.01; planted
# twins sit at exactly 1.0), so summation-order ulp noise cannot flip a
# keep/drop decision.
# ---------------------------------------------------------------------------

def semantic_augmented_embeddings(sf_dir: str):
    """embeddings ∪ SQL-reproducible duplicate twins (exact copy +
    scaled copy), labels inherited so duplicate groups stay within one
    cluster."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ids = list(df["vec_id"].astype(np.int64))
        vecs = [np.asarray(v, dtype=np.float64) for v in df["embedding"]]
        labs = list(df["label"].astype(np.int32))
        for vid, v, lab in zip(df["vec_id"].astype(np.int64),
                               df["embedding"],
                               df["label"].astype(np.int32)):
            if vid % 25 == 0:
                ids.append(int(vid) + 1_000_000)
                vecs.append(np.asarray(v, dtype=np.float64))
                labs.append(int(lab))
            if vid % 37 == 0:
                ids.append(int(vid) + 2_000_000)
                vecs.append(np.asarray(v, dtype=np.float64) * 2.0)
                labs.append(int(lab))
        return pd.DataFrame({"vec_id": np.array(ids, dtype=np.int64),
                             "embedding": vecs,
                             "label": np.array(labs, dtype=np.int32)})

    return ds.map_batches(expand, batch_format="pandas")


def embedding_semantic_dedup(sf_dir: str, threshold: float = 0.95):
    """SemDeDup survivor set: (vec_id, label, kept) for the augmented
    corpus — ``kept`` is False exactly for the non-min members of each
    within-cluster cosine-duplicate component.  ONE exchange (on the
    cluster label); the per-cluster task runs a normalized matmul,
    thresholds, and collapses components with a local union-find —
    vectors never ride a pair exchange.  Partitioning assumption (the
    published algorithm's own): cluster sizes are bounded by the
    k-means k, so the per-task quadratic is a design constant, not a
    corpus-growth term."""
    aug = semantic_augmented_embeddings(sf_dir)

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        ids = g["vec_id"].to_numpy(np.int64)
        e = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g["embedding"]])
        norms = np.linalg.norm(e, axis=1)
        norms[norms == 0] = 1.0
        en = e / norms[:, None]
        sims = en @ en.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        parent = np.arange(len(ids))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ia, ib):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo          # ids ascending → min-id root
        kept = np.fromiter((find(int(i)) == i for i in range(len(ids))),
                           dtype=bool, count=len(ids))
        return pd.DataFrame({
            "vec_id": ids,
            "label": g["label"].to_numpy(np.int32),
            "kept": kept})

    return aug.groupby("label").map_groups(dedup_cluster,
                                           batch_format="pandas")


# Recursive-CTE transitive closure over the within-label duplicate
# edges; kept = vec_id equals its component minimum.  Closure size is
# bounded by the duplicate-group size (≤ 3 here: original + 2 twins).
SEMANTIC_DEDUP_SQL = """
WITH RECURSIVE aug AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]), label
  FROM embeddings WHERE vec_id % 25 = 0
  UNION ALL
  SELECT vec_id + 2000000,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0),
         label
  FROM embeddings WHERE vec_id % 37 = 0),
edges AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM aug a JOIN aug b
    ON a.label = b.label AND a.vec_id <> b.vec_id
   AND list_cosine_similarity(a.v, b.v) >= 0.95),
reach(v, r) AS (
  SELECT vec_id, vec_id FROM aug
  UNION
  SELECT reach.v, e.vb FROM reach JOIN edges e ON reach.r = e.va)
SELECT a.vec_id, a.label, (m.root = a.vec_id) AS kept
FROM aug a
JOIN (SELECT v, min(r) AS root FROM reach GROUP BY v) m
  ON m.v = a.vec_id
"""


# ---------------------------------------------------------------------------
# Batched multi-query kNN — the production retrieval shape (a REQUEST
# BATCH of Q queries against the corpus), versus the single-query
# operators above.  Scale design: the (Q × dim) query matrix is tiny
# and broadcasts once via ray.put; each corpus batch computes one
# (batch × Q) matmul and emits its per-query top-k PARTIAL (≤ Q·k rows
# per batch — the combiner), and one final per-query fold over the
# ≤ n_batches·Q·k survivors produces exact global ranks.  No corpus
# broadcast, no pair exchange; the corpus streams exactly once.
# ---------------------------------------------------------------------------

def knn_multi_query(sf_dir: str, n_queries: int = 8, k: int = 10):
    """Exact top-k per query for the ``n_queries`` lowest-vec_id
    embeddings: (query_id, rank, vec_id), rank by (cosine desc, vec_id)
    — integer-only output, so the oracle comparison never touches the
    float cosine (the knn_brute_force parity pattern)."""
    path = f"{sf_dir}/embeddings.parquet"
    qids = np.sort(np.asarray(
        pq.read_table(path, columns=["vec_id"])["vec_id"]))[:n_queries]
    qtab = pq.read_table(path, columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<=", int(qids[-1]))])
    order = np.argsort(np.asarray(qtab["vec_id"], dtype=np.int64))
    qm = np.stack([np.asarray(qtab["embedding"][int(i)].as_py(),
                              dtype=np.float64) for i in order])
    qm = qm / np.linalg.norm(qm, axis=1)[:, None]
    qref = ray.put((np.asarray(qtab["vec_id"], dtype=np.int64)[order],
                    qm))

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def partial(df: pd.DataFrame, _qref=qref, _k=k) -> pd.DataFrame:
        qid_arr, qmat = ray.get(_qref)
        e = _emb_matrix(df)
        en = e / np.maximum(np.linalg.norm(e, axis=1), 1e-300)[:, None]
        sims = en @ qmat.T                        # (batch, Q)
        ids = df["vec_id"].to_numpy(np.int64)
        out_q, out_v, out_s = [], [], []
        for j in range(sims.shape[1]):
            col = sims[:, j]
            top = np.lexsort((ids, -col))[:_k]    # cos desc, vec_id asc
            out_q.append(np.full(len(top), qid_arr[j], dtype=np.int64))
            out_v.append(ids[top])
            out_s.append(col[top])
        return pd.DataFrame({
            "query_id": np.concatenate(out_q),
            "vec_id": np.concatenate(out_v),
            "cosine": np.concatenate(out_s)})

    partials = ds.map_batches(partial, batch_format="pandas")

    def final(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        top = g.sort_values(["cosine", "vec_id"],
                            ascending=[False, True],
                            kind="mergesort").head(_k)
        return pd.DataFrame({
            "query_id": top["query_id"].to_numpy(np.int64),
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "vec_id": top["vec_id"].to_numpy(np.int64)})

    return partials.groupby("query_id").map_groups(
        final, batch_format="pandas")


KNN_MULTI_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 8)
SELECT query_id, rank, vec_id FROM (
  SELECT q.query_id,
         CAST(row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]), qv) DESC,
                    e.vec_id) AS BIGINT) AS rank,
         e.vec_id
  FROM q CROSS JOIN embeddings e) t
WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# kNN SELF-JOIN via IVF cells — the all-vectors neighbor-graph workload
# (dedup graphs, link prediction, graph-based ANN index builds).  Every
# vector is a MEMBER of its nearest cell and a QUERY in its ``nprobe``
# nearest cells; one exchange on the cell id co-locates each query with
# the members it must score, a per-cell normalized matmul emits local
# per-query top-k partials, and a second slim exchange on the query id
# merges them.  Vectors ride the cell exchange as raw float64 bytes
# (the ``_attach_vec`` convention), nprobe× the corpus — the standard
# IVF-join cost.  Accuracy is driver-gated the ``knn_recall_gate`` way:
# the oracle-comparable output is the EXACT top-k rows of a pinned
# query sample (recomputable in SQL) plus a mean-recall flag the SQL
# asserts TRUE, so recall drift turns the row red.
# ---------------------------------------------------------------------------

def knn_join_ivf(sf_dir: str, k: int = 5, n_centroids: int = 16,
                 nprobe: int = 4, n_sample: int = 16,
                 min_mean_recall: float = 0.25):
    """(query_id, rank, exact_neighbor, ivf_recall_ok) for the
    ``n_sample`` lowest-vec_id queries: exact top-k neighbor rows
    (self excluded; rank by cosine desc, vec_id) + a flag asserting the
    IVF self-join's MEAN recall@k over the sample ≥
    ``min_mean_recall`` (nprobe/n_centroids = 1/4 of the corpus
    scanned; measured mean recall on the random-gaussian corpus — the
    adversarial ANN case — sits in (0.25, 0.55] at the 500-vector
    tiers and (0.55, 0.75] at 2000 vectors, so the 0.25 floor holds
    with margin at every tier)."""
    path = f"{sf_dir}/embeddings.parquet"
    cents = _ivf_centroids(sf_dir, n_centroids)
    cref = ray.put(cents)
    dim = cents.shape[1]
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def emit(df: pd.DataFrame, _cref=cref) -> pd.DataFrame:
        cs = ray.get(_cref)
        e = _emb_matrix(df)
        ids = df["vec_id"].to_numpy(np.int64)
        d = ((e[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1)
        cells, vids, blobs, sides = [], [], [], []
        for i in range(len(ids)):
            blob = e[i].tobytes()
            cells.append(int(order[i, 0]))          # member of own cell
            vids.append(int(ids[i]))
            blobs.append(blob)
            sides.append(1)
            for c in order[i, :nprobe]:             # queries probe cells
                cells.append(int(c))
                vids.append(int(ids[i]))
                blobs.append(blob)
                sides.append(0)
        return pd.DataFrame({
            "cell": np.array(cells, dtype=np.int32),
            "vec_id": np.array(vids, dtype=np.int64),
            "emb": pd.Series(blobs, dtype=object),
            "side": np.array(sides, dtype=np.int8)})

    def cell_topk(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        mem = g[g["side"] == 1]
        qry = g[g["side"] == 0]
        if mem.empty or qry.empty:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype=np.int64),
                "neighbor_id": pd.Series([], dtype=np.int64),
                "cosine": pd.Series([], dtype=np.float64)})
        em = np.stack([np.frombuffer(b, dtype=np.float64)
                       for b in mem["emb"]])
        eq = np.stack([np.frombuffer(b, dtype=np.float64)
                       for b in qry["emb"]])
        em = em / np.maximum(np.linalg.norm(em, axis=1), 1e-300)[:, None]
        eq = eq / np.maximum(np.linalg.norm(eq, axis=1), 1e-300)[:, None]
        mids = mem["vec_id"].to_numpy(np.int64)
        qids = qry["vec_id"].to_numpy(np.int64)
        sims = eq @ em.T
        sims[qids[:, None] == mids[None, :]] = -np.inf   # exclude self
        oq, on, os_ = [], [], []
        for i in range(len(qids)):
            row = sims[i]
            top = np.lexsort((mids, -row))[:_k]
            keep = row[top] > -np.inf
            top = top[keep]
            oq.append(np.full(len(top), qids[i], dtype=np.int64))
            on.append(mids[top])
            os_.append(row[top])
        return pd.DataFrame({
            "query_id": np.concatenate(oq) if oq else
            np.array([], dtype=np.int64),
            "neighbor_id": np.concatenate(on) if on else
            np.array([], dtype=np.int64),
            "cosine": np.concatenate(os_) if os_ else
            np.array([], dtype=np.float64)})

    def final_topk(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        g = g.drop_duplicates(["query_id", "neighbor_id"])
        top = g.sort_values(["cosine", "neighbor_id"],
                            ascending=[False, True],
                            kind="mergesort").head(_k)
        return pd.DataFrame({
            "query_id": top["query_id"].to_numpy(np.int64),
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "neighbor_id": top["neighbor_id"].to_numpy(np.int64)})

    ivf = ds.map_batches(emit, batch_format="pandas", batch_size=256) \
        .groupby("cell").map_groups(cell_topk, batch_format="pandas") \
        .groupby("query_id").map_groups(final_topk,
                                        batch_format="pandas")

    # --- accuracy gate over the pinned sample: exact top-k (the
    # knn_multi_query pattern, self excluded) + mean recall vs IVF ---
    qid_all = np.sort(np.asarray(
        pq.read_table(path, columns=["vec_id"])["vec_id"]))[:n_sample]
    qtab = pq.read_table(path, columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<=", int(qid_all[-1]))])
    qorder = np.argsort(np.asarray(qtab["vec_id"], dtype=np.int64))
    qm = np.stack([np.asarray(qtab["embedding"][int(i)].as_py(),
                              dtype=np.float64) for i in qorder])
    qm = qm / np.linalg.norm(qm, axis=1)[:, None]
    qids = np.asarray(qtab["vec_id"], dtype=np.int64)[qorder]
    qref = ray.put((qids, qm))

    def exact_partial(df: pd.DataFrame, _qref=qref, _k=k) -> pd.DataFrame:
        sq, sqm = ray.get(_qref)
        e = _emb_matrix(df)
        en = e / np.maximum(np.linalg.norm(e, axis=1), 1e-300)[:, None]
        sims = en @ sqm.T
        ids = df["vec_id"].to_numpy(np.int64)
        oq, ov, os_ = [], [], []
        for j in range(sims.shape[1]):
            col = sims[:, j].copy()
            col[ids == sq[j]] = -np.inf             # exclude self
            top = np.lexsort((ids, -col))[:_k]
            keep = col[top] > -np.inf
            top = top[keep]
            oq.append(np.full(len(top), sq[j], dtype=np.int64))
            ov.append(ids[top])
            os_.append(col[top])
        return pd.DataFrame({
            "query_id": np.concatenate(oq),
            "neighbor_id": np.concatenate(ov),
            "cosine": np.concatenate(os_)})

    exact = ds.map_batches(exact_partial, batch_format="pandas") \
        .groupby("query_id").map_groups(final_topk,
                                        batch_format="pandas") \
        .to_pandas()                     # bounded: n_sample · k rows

    sample_set = set(int(q) for q in qids)

    def only_sample(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["query_id"].isin(sample_set)]

    got = ivf.map_batches(only_sample, batch_format="pandas") \
        .to_pandas()                     # bounded: n_sample · k rows
    hits = 0
    for q in qids:
        ex = set(exact.loc[exact["query_id"] == q, "neighbor_id"]
                 .astype(int))
        iv = set(got.loc[got["query_id"] == q, "neighbor_id"]
                 .astype(int))
        hits += len(ex & iv)
    ok = bool(hits / float(len(qids) * k) >= min_mean_recall)
    exact = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pd.DataFrame({
        "query_id": exact["query_id"].to_numpy(np.int64),
        "rank": exact["rank"].to_numpy(np.int64),
        "exact_neighbor": exact["neighbor_id"].to_numpy(np.int64),
        "ivf_recall_ok": np.full(len(exact), ok)})


KNN_JOIN_IVF_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 16)
SELECT query_id, rank, exact_neighbor, TRUE AS ivf_recall_ok FROM (
  SELECT q.query_id,
         CAST(row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(
                      CAST(e.embedding AS DOUBLE[]), qv) DESC,
                    e.vec_id) AS BIGINT) AS rank,
         e.vec_id AS exact_neighbor
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id) t
WHERE rank <= 5
"""
