"""Relational operators over the testdata Parquet tables.

Generalizes the reference's aggregation/sort/top-k surface (SURVEY.md §2.5,
§2.6 — per-page metrics G1, grouped QA summaries G2/G5, top-k O3, limits O4)
into engine-grade relational operators, each with an exact DuckDB oracle
(driver correctness gate).

Design rules for 100 TB scale:
- column pruning at the read (``columns=[...]``),
- partial aggregation inside ``map_batches`` (one row per key per batch)
  before the small ``groupby`` — the shuffle moves partials, not rows,
- small sides (customer, nation) broadcast via ``ray.put`` + per-batch
  numpy/pandas lookup, never a shuffle join,
- float aggregates computed as exact integer cents/micros (per-row
  ``round(x*scale)`` is unambiguous for decimal-valued columns), so the
  Ray result matches the SQL oracle bit-for-bit regardless of summation
  order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..partitioning import buckets_for, checked_put, table_bytes


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _cents(x: pd.Series | np.ndarray) -> np.ndarray:
    return np.rint(np.asarray(x, dtype=np.float64) * 100).astype(np.int64)


def _micros(x: pd.Series | np.ndarray) -> np.ndarray:
    return np.rint(np.asarray(x, dtype=np.float64) * 1_000_000).astype(np.int64)


def _int_join(probe: np.ndarray, keys: np.ndarray,
              vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized inner-join lookup for the bucket-fold kernels: for
    each int64 ``probe``, find its value in the (unique-keyed) dim side.
    Returns ``(hit_mask, vals_for_hits)`` aligned so
    ``probe[hit_mask]`` pairs with the returned values.

    This replaces the former ``dict(zip(...))`` + ``Series.map``
    pattern, which hashes every probe in the Python interpreter — the
    measured A/B at a typical bucket shape (400k probes, 60k dim keys)
    is 445 ms dict+map vs 71 ms argsort+searchsorted vs 34 ms pd.merge;
    searchsorted is used where the caller needs mask/probe ALIGNMENT
    (merge reorders), merge where it doesn't (see q5's fold kernels).
    At sf0.1 the exchange latency hides this; at 100 TB the fold kernel
    is the whole bucket-task cost (round-4 verdict #6)."""
    probe = np.ascontiguousarray(probe, dtype=np.int64)
    if len(keys) == 0 or len(probe) == 0:
        return np.zeros(len(probe), dtype=bool), vals[:0]
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    v = vals[order]
    pos = np.minimum(np.searchsorted(k, probe), len(k) - 1)
    hit = k[pos] == probe
    return hit, v[pos[hit]]


# ---------------------------------------------------------------------------
# Q1-style pricing summary: filter → partial agg per batch → tiny groupby
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
    cutoff = pd.Timestamp("1998-09-02")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= cutoff]
        if df.empty:
            return pd.DataFrame({
                "l_returnflag": pd.Series([], dtype=str),
                "l_linestatus": pd.Series([], dtype=str),
                "qty_i": pd.Series([], dtype=np.int64),
                "price_c": pd.Series([], dtype=np.int64),
                "disc_price_u": pd.Series([], dtype=np.int64),
                "charge_u": pd.Series([], dtype=np.int64),
                "disc_c": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64)})
        price = df["l_extendedprice"].to_numpy()
        disc = df["l_discount"].to_numpy()
        tax = df["l_tax"].to_numpy()
        disc_price = price * (1.0 - disc)
        t = pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "l_linestatus": df["l_linestatus"].to_numpy(),
            "qty_i": _cents(df["l_quantity"]),
            "price_c": _cents(price),
            "disc_price_u": _micros(disc_price),
            "charge_u": _micros(disc_price * (1.0 + tax)),
            "disc_c": _cents(disc),
            "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby(["l_returnflag", "l_linestatus"],
                         as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_i", alias_name="qty_i"),
        Sum("price_c", alias_name="price_c"),
        Sum("disc_price_u", alias_name="disc_price_u"),
        Sum("charge_u", alias_name="charge_u"),
        Sum("disc_c", alias_name="disc_c"),
        Sum("n", alias_name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy()
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": df["qty_i"] / 100.0,
            "sum_base_price": df["price_c"] / 100.0,
            "sum_disc_price": df["disc_price_u"] / 1_000_000.0,
            "sum_charge": df["charge_u"] / 1_000_000.0,
            "avg_qty": (df["qty_i"] / 100.0) / n,
            "avg_price": (df["price_c"] / 100.0) / n,
            "avg_disc": (df["disc_c"] / 100.0) / n,
            "count_order": df["n"],
        })

    return agg.map_batches(finish, batch_format="pandas")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
  sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))/1000000.0
    AS sum_disc_price,
  sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT))
    /1000000.0 AS sum_charge,
  (sum(CAST(round(l_quantity*100) AS BIGINT))/100.0)/count(*) AS avg_qty,
  (sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0)/count(*) AS avg_price,
  (sum(CAST(round(l_discount*100) AS BIGINT))/100.0)/count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Vectorized filter + projection (per-row arithmetic, zero-copy Arrow)
# ---------------------------------------------------------------------------

def filter_project_revenue(sf_dir: str):
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater_equal(batch["l_quantity"], 30.0),
                       pc.greater_equal(batch["l_discount"], 0.05))
        batch = batch.filter(mask)
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_linenumber": batch["l_linenumber"],
            "revenue": rev})

    return ds.map_batches(fn, batch_format="pyarrow")


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice*(1-l_discount) AS revenue
FROM lineitem
WHERE l_quantity >= 30 AND l_discount >= 0.05
"""


# ---------------------------------------------------------------------------
# Broadcast joins (small dimension side via ray.put; no shuffle join)
# ---------------------------------------------------------------------------

class _SegmentLookup:
    """Actor-pool batch join: customer dim broadcast once via ray.put and
    fetched in __init__ (reference J3 'dictionary lookup small side' —
    SURVEY.md §2.4)."""

    def __init__(self, cust_ref):
        cust = ray.get(cust_ref)
        self.seg = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        seg = df["o_custkey"].map(self.seg)
        t = pd.DataFrame({
            "c_mktsegment": seg,
            "price_c": _cents(df["o_totalprice"]),
            "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby("c_mktsegment", as_index=False).sum()


def join_orders_customer_segment(sf_dir: str):
    cust = pq.read_table(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_mktsegment"]).to_pydict()
    cust_ref = checked_put(cust, "customer dim (custkey->segment)")
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])
    partials = ds.map_batches(_SegmentLookup, batch_format="pandas",
                              concurrency=(1, 4),
                              fn_constructor_kwargs={"cust_ref": cust_ref})
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("price_c", alias_name="price_c"), Sum("n", alias_name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_mktsegment": df["c_mktsegment"],
            "n_orders": df["n"],
            "total_price": df["price_c"] / 100.0})

    return agg.map_batches(finish, batch_format="pandas")


JOIN_SEGMENT_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def join_customer_nation_balance(sf_dir: str):
    nation = pq.read_table(_t(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"]).to_pydict()
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    nref = checked_put(nmap, "nation name map")
    ds = rd.read_parquet(_t(sf_dir, "customer"),
                         columns=["c_nationkey", "c_acctbal"])

    def partial(df: pd.DataFrame, _nref=nref) -> pd.DataFrame:
        nm = ray.get(_nref)
        t = pd.DataFrame({
            "n_name": df["c_nationkey"].map(nm),
            "bal_c": _cents(df["c_acctbal"]),
            "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby("n_name", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    agg = partials.groupby("n_name").aggregate(
        Sum("bal_c", alias_name="bal_c"), Sum("n", alias_name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_name": df["n_name"],
            "n_customers": df["n"],
            "sum_acctbal": df["bal_c"] / 100.0})

    return agg.map_batches(finish, batch_format="pandas")


JOIN_NATION_SQL = """
SELECT n_name, count(*) AS n_customers,
       sum(CAST(round(c_acctbal*100) AS BIGINT))/100.0 AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Sort / top-k / distinct
# ---------------------------------------------------------------------------

def local_topk(ds, keys: list[str], descending: list[bool], k: int):
    """Top-k without a total sort: per-batch partial top-k (each batch
    contributes ≤ k rows), then one small sort over the ≤ n_batches·k
    surviving rows.  Replaces the all-to-all sort shuffle with a
    combiner-style merge — the scale shape for k ≪ n."""
    ascending = [not d for d in descending]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(keys, ascending=ascending,
                              kind="mergesort").head(k)

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.sort(keys, descending=descending).limit(k)


def coarse_topk_counts(partials, key_col: str, k: int, n_buckets: int):
    """Exact global top-k of per-batch partial COUNTS over a high-
    cardinality string key — the coarse-bucket fold shape (never a Ray
    groupby over the fine key space: Ray's sort-based Aggregate pays per
    distinct partial row, which at web scale means 10^8+ token/bigram
    keys through the exchange; measured 5.2 s → 0.9 s at sf0.01 for
    bigrams).

    ``partials`` has columns (key_col, "n"): per-batch pre-combined
    counts.  Rows shuffle ONCE by ``crc32(key) % P``; a key lives in
    exactly one bucket, so the bucket-local sum is its exact global
    count and a bucket-local head(k) is globally valid for its keys.
    The ≤ P×k survivors merge locally — bounded, never the corpus."""
    import zlib

    def key(df: pd.DataFrame) -> pd.DataFrame:
        cb = np.fromiter((zlib.crc32(s.encode()) % n_buckets
                          for s in df[key_col]),
                         dtype=np.int64, count=len(df))
        return df.assign(bucket=cb.astype(np.int32))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(key_col, as_index=False)["n"].sum() \
            .sort_values(["n", key_col], ascending=[False, True],
                         kind="mergesort").head(k)
        return pd.DataFrame({key_col: t[key_col].to_numpy(),
                             "n": t["n"].to_numpy(np.int64)})

    folded = partials.map_batches(key, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas")
    out = folded.to_pandas() \
        .sort_values(["n", key_col], ascending=[False, True],
                     kind="mergesort").head(k).reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out


def topk_orders(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return local_topk(ds, ["o_totalprice", "o_orderkey"], [True, False], 10)


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def distinct_brands(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_brand"])
    vals = sorted(ds.unique("p_brand"))
    return pa.table({"p_brand": pa.array(vals, pa.string())})


DISTINCT_SQL = "SELECT DISTINCT p_brand FROM part"


# ---------------------------------------------------------------------------
# Event-time windows & sessionization (streaming-shaped; SURVEY.md §2.12 —
# the reference has no windows, these are the training-pipeline extensions)
# ---------------------------------------------------------------------------

def events_hourly_window(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("int64").to_numpy()       # epoch microseconds
        window_start = (us // 3_600_000_000) * 3600    # epoch seconds
        t = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "window_start": window_start,
            "value_u": _micros(df["value"]),
            "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby(["event_type", "window_start"],
                         as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    agg = partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("value_u", alias_name="value_u"), Sum("n", alias_name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "window_start": df["window_start"],
            "n_events": df["n"],
            "sum_value": df["value_u"] / 1_000_000.0})

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_WINDOW_SQL = """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       count(*) AS n_events,
       sum(CAST(round(value*1000000) AS BIGINT))/1000000.0 AS sum_value
FROM events GROUP BY event_type, window_start
"""


def events_sliding_window(sf_dir: str, size_s: int = 3600, slide_s: int = 1800):
    """Sliding event-time window (size 1 h, slide 30 min): each event lands
    in size/slide windows — emitted per batch, pre-aggregated, then a tiny
    groupby.  The standard batch re-expression of a streaming sliding
    window over a partitioned log."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])
    n_windows = size_s // slide_s

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df["ts"].astype("int64").to_numpy() // 1_000_000
        base = (s // slide_s) * slide_s
        frames = []
        for i in range(n_windows):
            frames.append(pd.DataFrame({
                "event_type": df["event_type"].to_numpy(),
                "window_start": base - i * slide_s,
                "n": np.ones(len(df), dtype=np.int64)}))
        t = pd.concat(frames, ignore_index=True)
        return t.groupby(["event_type", "window_start"],
                         as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("n", alias_name="n_events"))


EVENTS_SLIDING_SQL = """
WITH e AS (SELECT event_type,
                  CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
x AS (
  SELECT event_type, (s // 1800) * 1800 AS window_start FROM e
  UNION ALL
  SELECT event_type, (s // 1800) * 1800 - 1800 AS window_start FROM e)
SELECT event_type, window_start, count(*) AS n_events
FROM x GROUP BY event_type, window_start
"""


# Partition counts for every bucketed exchange come from
# partitioning.buckets_for (P ~ bytes/256 MB at corpus scale, 2xCPU floor
# here); operators still take n_buckets as an argument for tests.


def events_sessions(sf_dir: str, gap_seconds: int = 1800,
                   n_buckets: int | None = None):
    """Per-user session count with a 30-min inactivity gap.

    Bucketed fold (stages/assemble.py pattern): group by the COARSE key
    ``user_id % P`` — one ``map_groups`` task per bucket, not per user
    (Ray pays ~1 ms of framework overhead per group; per-user grouping is
    catastrophic at 10^8 users) — then detect per-user session breaks
    vectorized over the whole sorted bucket with numpy run boundaries."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_id", "ts"])
    n_buckets = n_buckets or buckets_for(table_bytes(sf_dir, "events"))

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["user_id"].to_numpy() % n_buckets)
            .astype(np.int32),
            "user_id": df["user_id"].to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "ts_us": df["ts"].astype("int64").to_numpy()})

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        n = len(g)
        same_user = uid[1:] == uid[:-1]
        brk = same_user & (np.diff(ts) > gap_seconds * 1_000_000)
        starts = np.concatenate(
            ([0], np.flatnonzero(~same_user) + 1)) if n > 1 \
            else np.array([0])
        ends = np.concatenate((starts[1:], [n]))
        brk_cum = np.concatenate(([0], np.cumsum(brk)))
        return pd.DataFrame({
            "user_id": uid[starts].astype(np.int64),
            "n_events": (ends - starts).astype(np.int64),
            # breaks within a user run = brk_cum[end-1] - brk_cum[start]
            "n_sessions": (1 + brk_cum[ends - 1] -
                           brk_cum[starts]).astype(np.int64)})

    return keyed.groupby("bucket").map_groups(fold_bucket,
                                              batch_format="pandas")


EVENTS_SESSIONS_SQL = """
WITH d AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
              (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events)
SELECT user_id, count(*) AS n_events,
       CAST(1 + sum(brk) AS BIGINT) AS n_sessions
FROM d GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Grouped count on embeddings labels (vector-table groupby)
# ---------------------------------------------------------------------------

def label_counts(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["label"])
    agg = ds.groupby("label").aggregate(Count(alias_name="n"))
    return agg


LABEL_COUNTS_SQL = """
SELECT CAST(label AS BIGINT) AS label, count(*) AS n
FROM embeddings GROUP BY label
"""


# ---------------------------------------------------------------------------
# Large-large join: explicit bucketed hash join (both sides big → neither
# broadcasts; each side is hash-partitioned on the key and buckets joined
# pairwise inside map_groups — the portable partitioned-hash-join pattern)
# ---------------------------------------------------------------------------

def join_lineitem_orders_priority(sf_dir: str):
    """Revenue per o_orderpriority: lineitem ⋈ orders on orderkey, both
    sides hash-bucketed on the key; per-bucket pandas merge; partial
    aggregation per bucket before the tiny final groupby."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    n_buckets = buckets_for(table_bytes(sf_dir, "lineitem"))

    # both key maps emit the SAME column set (missing side filled with a
    # typed placeholder) so the union is schema-stable — no Ray schema
    # warnings and the int64 rev_u never round-trips through float64 in
    # mixed groups
    def key_li(df: pd.DataFrame) -> pd.DataFrame:
        price = df["l_extendedprice"].to_numpy()
        disc = df["l_discount"].to_numpy()
        return pd.DataFrame({
            "bucket": (df["l_orderkey"].to_numpy() % n_buckets)
            .astype(np.int32),
            "orderkey": df["l_orderkey"].to_numpy(),
            "rev_u": _micros(price * (1.0 - disc)),
            "priority": np.full(len(df), "", dtype=object),
            "side": np.zeros(len(df), dtype=np.int8)})

    def key_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["o_orderkey"].to_numpy() % n_buckets)
            .astype(np.int32),
            "orderkey": df["o_orderkey"].to_numpy(),
            "rev_u": np.zeros(len(df), dtype=np.int64),
            "priority": df["o_orderpriority"].to_numpy(),
            "side": np.ones(len(df), dtype=np.int8)})

    both = li.map_batches(key_li, batch_format="pandas").union(
        orders.map_batches(key_orders, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["orderkey", "rev_u"]]
        right = g[g["side"] == 1][["orderkey", "priority"]]
        m = left.merge(right, on="orderkey", how="inner")
        if m.empty:
            return pd.DataFrame({
                "o_orderpriority": pd.Series([], dtype=str),
                "rev_u": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64)})
        t = pd.DataFrame({"o_orderpriority": m["priority"],
                          "rev_u": m["rev_u"].astype(np.int64),
                          "n": np.ones(len(m), dtype=np.int64)})
        return t.groupby("o_orderpriority", as_index=False).sum()

    partials = both.groupby("bucket").map_groups(join_bucket,
                                                 batch_format="pandas")
    agg = partials.groupby("o_orderpriority").aggregate(
        Sum("rev_u", alias_name="rev_u"), Sum("n", alias_name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "n_items": df["n"],
            "revenue": df["rev_u"] / 1_000_000.0})

    return agg.map_batches(finish, batch_format="pandas")


JOIN_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
         /1000000.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Semi / anti join: bucketed exchange on the key — the fact side's keys are
# batch-deduped (combiner) then hash-bucketed; the semi/anti filter runs
# per bucket inside map_groups.  No driver-side key-set materialization
# (round-1 pulled every o_custkey into a driver Python set — a scale
# killer when orders is the 100 TB fact table).
# ---------------------------------------------------------------------------

def _semi_anti_join(sf_dir: str, anti: bool):
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])
    n_buckets = buckets_for(table_bytes(sf_dir, "orders"))

    def key_cust(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["c_custkey"].to_numpy() % n_buckets)
            .astype(np.int32),
            "custkey": df["c_custkey"].to_numpy(),
            "c_name": df["c_name"].astype(object),
            "side": np.zeros(len(df), dtype=np.int8)})

    def key_orders(df: pd.DataFrame) -> pd.DataFrame:
        ks = pd.unique(df["o_custkey"])   # batch-level combiner: the
        return pd.DataFrame({             # shuffle moves distinct keys only
            "bucket": (ks % n_buckets).astype(np.int32),
            "custkey": ks,
            "c_name": np.full(len(ks), "", dtype=object),
            "side": np.ones(len(ks), dtype=np.int8)})

    both = cust.map_batches(key_cust, batch_format="pandas").union(
        orders.map_batches(key_orders, batch_format="pandas"))

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        have = set(g.loc[g["side"] == 1, "custkey"])
        c = g[g["side"] == 0]
        mask = ~c["custkey"].isin(have) if anti else c["custkey"].isin(have)
        c = c[mask]
        return pd.DataFrame({
            "c_custkey": c["custkey"].to_numpy().astype(np.int64),
            "c_name": c["c_name"].astype(object)})

    return both.groupby("bucket").map_groups(filter_bucket,
                                             batch_format="pandas")


def semi_join_customers_with_orders(sf_dir: str):
    """Customers having ≥1 order (bucketed semi join)."""
    return _semi_anti_join(sf_dir, anti=False)


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def anti_join_customers_no_orders(sf_dir: str):
    """Customers with NO orders (bucketed anti join).  The RESULT (not an
    input) is materialized to a typed frame: an all-empty Dataset loses
    its schema on to_pandas, and the anti-join output is bounded by the
    dim side's cardinality."""
    out = _semi_anti_join(sf_dir, anti=True).to_pandas()
    if out.empty:
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                            "c_name": pd.Series([], dtype=str)})
    return out


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# Semi-structured parsing: JSON-in-string props column (events)
# ---------------------------------------------------------------------------

def events_json_props(sf_dir: str):
    """Parse the JSON ``props`` column per row and aggregate the extracted
    field per event type (vectorized-enough: json.loads in a batch map,
    integer aggregates → exact SQL parity via DuckDB json_extract)."""
    import json

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks = np.fromiter((int(json.loads(p)["k"]) for p in df["props"]),
                         dtype=np.int64, count=len(df))
        t = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "sum_k": ks,
                          "max_k": ks,
                          "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby("event_type", as_index=False).agg(
            sum_k=("sum_k", "sum"), max_k=("max_k", "max"), n=("n", "sum"))

    partials = ds.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Max as _Max
    return partials.groupby("event_type").aggregate(
        Sum("sum_k", alias_name="sum_k"),
        _Max("max_k", alias_name="max_k"),
        Sum("n", alias_name="n_events"))


EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Token explode + corpus frequency top-k (flat_map + shuffle + top-k)
# ---------------------------------------------------------------------------

def doc_top_tokens(sf_dir: str, k: int = 20):
    """Corpus-wide token frequencies, top-k (count desc, token asc).
    Tokens are pre-counted per batch (combiner) so the shuffle moves
    (token, partial_count) rows, never the exploded token stream; the
    exchange + finish is the ``coarse_topk_counts`` fold (one coarse
    shuffle, never a Ray groupby over the fine 10^8+-token key space)."""
    from collections import Counter

    from ..functions.fingerprint import words
    from ..partitioning import buckets_for, table_bytes

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])
    n_buckets = buckets_for(table_bytes(sf_dir, "documents"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            c.update(words(t))
        if not c:
            return pd.DataFrame({"token": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        toks, counts = zip(*sorted(c.items()))
        return pd.DataFrame({"token": list(toks),
                             "n": np.array(counts, dtype=np.int64)})

    partials = ds.map_batches(partial, batch_format="pandas")
    return coarse_topk_counts(partials, "token", k, n_buckets)


DOC_TOP_TOKENS_SQL = """
SELECT token, count(*) AS n FROM (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents) t
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


# ---------------------------------------------------------------------------
# 3-table pipeline: filter dim → broadcast → fact partial agg → top-k (Q3-ish)
# ---------------------------------------------------------------------------

def q3_segment_revenue(sf_dir: str, segment: str = "BUILDING", k: int = 10):
    """Q3-style 3-table pipeline, scale shape (round-2 rewrite):

    - customer is the DIM side: only the segment-FILTERED custkeys are
      read (row-group-pruned, 2 columns) and broadcast via ``ray.put`` —
      a true small-side broadcast, not the fact table.
    - orders ⋈ lineitem is a fact-fact BUCKETED hash join on orderkey
      (same pattern as join_lineitem_orders_priority): orders filtered to
      the segment in-flight, lineitem pre-aggregated per (orderkey) per
      batch, both sides shuffled by ``orderkey % P`` only as slim
      (bucket, orderkey, int64) rows — the round-1 version built a
      driver-side dict of every BUILDING order (driver OOM at 100 TB).
    - per-bucket fine aggregation is vectorized pandas; per-bucket local
      top-k caps the final sort at buckets·k rows.
    """
    cust = pq.read_table(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"],
        filters=[("c_mktsegment", "==", segment)])
    seg_ref = checked_put(set(cust["c_custkey"].to_pylist()),
                          "segment customer keys")
    n_buckets = buckets_for(table_bytes(sf_dir, "lineitem"))

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def key_orders(df: pd.DataFrame, _ref=seg_ref) -> pd.DataFrame:
        seg_keys = ray.get(_ref)   # per-worker plasma-cached
        df = df[df["o_custkey"].isin(seg_keys)]
        date_s = (df["o_orderdate"].astype("int64") // 1_000_000).to_numpy()
        return pd.DataFrame({
            "bucket": (df["o_orderkey"].to_numpy() % n_buckets)
            .astype(np.int32),
            "orderkey": df["o_orderkey"].to_numpy(),
            "o_date_s": date_s.astype(np.int64),
            "rev_u": np.zeros(len(df), dtype=np.int64),
            "side": np.ones(len(df), dtype=np.int8)})

    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def key_li(df: pd.DataFrame) -> pd.DataFrame:
        price = df["l_extendedprice"].to_numpy()
        disc = df["l_discount"].to_numpy()
        t = pd.DataFrame({
            "orderkey": df["l_orderkey"].to_numpy(),
            "rev_u": _micros(price * (1.0 - disc))})
        t = t.groupby("orderkey", as_index=False).sum()   # batch combiner
        return pd.DataFrame({
            "bucket": (t["orderkey"].to_numpy() % n_buckets)
            .astype(np.int32),
            "orderkey": t["orderkey"].to_numpy(),
            "o_date_s": np.zeros(len(t), dtype=np.int64),
            "rev_u": t["rev_u"].to_numpy().astype(np.int64),
            "side": np.zeros(len(t), dtype=np.int8)})

    both = orders.map_batches(key_orders, batch_format="pandas").union(
        li.map_batches(key_li, batch_format="pandas", batch_size=16384))

    def join_bucket(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        right = g[g["side"] == 1][["orderkey", "o_date_s"]]
        left = g[g["side"] == 0][["orderkey", "rev_u"]]
        left = left.groupby("orderkey", as_index=False).sum()
        m = left.merge(right, on="orderkey", how="inner")
        if m.empty:
            return pd.DataFrame({
                "l_orderkey": pd.Series([], dtype=np.int64),
                "o_date_s": pd.Series([], dtype=np.int64),
                "revenue": pd.Series([], dtype=np.float64)})
        out = pd.DataFrame({"l_orderkey": m["orderkey"].astype(np.int64),
                            "o_date_s": m["o_date_s"].astype(np.int64),
                            "revenue": m["rev_u"] / 1_000_000.0})
        return out.sort_values(["revenue", "l_orderkey"],
                               ascending=[False, True]).head(_k)

    per_bucket = both.groupby("bucket").map_groups(join_bucket,
                                                   batch_format="pandas")
    return (per_bucket.sort(["revenue", "l_orderkey"],
                            descending=[True, False]).limit(k))


Q3_SQL = """
SELECT l_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_date_s,
       sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
         /1000000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_date_s
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# As-of join (attribution): purchase → latest preceding view per user.
# Ray Data has no native as-of join; the portable construction is a
# bucketed exchange on the equality key + pandas merge_asof per bucket
# (SURVEY.md custom-operator policy (a): composition of map_batches +
# groupby).  Partitioning assumption: all rows of one user fit one bucket
# task — the same assumption every by-key as-of join makes; salt the user
# key if a single user's history exceeds a task.
# ---------------------------------------------------------------------------

def events_asof_attribution(sf_dir: str, left_type: str = "purchase",
                            right_type: str = "view",
                            n_buckets: int | None = None):
    """For every ``purchase`` event: the latest ``view`` event of the same
    user at-or-before the purchase time (backward as-of, exact matches
    allowed — mirrors DuckDB ``ASOF LEFT JOIN ... ON ts >= ts``).
    Unmatched purchases carry -1 (kept integer, no NULL/NaN ambiguity in
    the hash gate)."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id", "event_type"])
    n_buckets = n_buckets or buckets_for(table_bytes(sf_dir, "events"))

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin([left_type, right_type])]
        return pd.DataFrame({
            "bucket": (df["user_id"].to_numpy() % n_buckets)
            .astype(np.int32),
            "user_id": df["user_id"].to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "ts_us": df["ts"].astype("int64").to_numpy(),
            "side": np.where(df["event_type"].to_numpy() == left_type,
                             0, 1).astype(np.int8)})

    keyed = ds.map_batches(key, batch_format="pandas")

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["user_id", "event_id", "ts_us"]] \
            .sort_values(["ts_us", "event_id"], kind="mergesort")
        right = g[g["side"] == 1][["user_id", "ts_us"]] \
            .sort_values("ts_us", kind="mergesort") \
            .assign(view_ts_us=lambda d: d["ts_us"])
        empty = pd.DataFrame({
            "purchase_id": pd.Series([], dtype=np.int64),
            "user_id": pd.Series([], dtype=np.int64),
            "view_ts_s": pd.Series([], dtype=np.int64),
            "lag_s": pd.Series([], dtype=np.int64)})
        if left.empty:
            return empty
        if right.empty:
            return pd.DataFrame({
                "purchase_id": left["event_id"].to_numpy(),
                "user_id": left["user_id"].to_numpy(),
                "view_ts_s": np.full(len(left), -1, dtype=np.int64),
                "lag_s": np.full(len(left), -1, dtype=np.int64)})
        m = pd.merge_asof(left, right, on="ts_us", by="user_id",
                          direction="backward", allow_exact_matches=True)
        matched = m["view_ts_us"].notna()
        vts = np.where(matched, m["view_ts_us"].fillna(0) // 1_000_000,
                       -1).astype(np.int64)
        # lag in whole seconds of floored epochs (matches the SQL oracle's
        # floor(epoch(p)) - floor(epoch(v)) exactly)
        pts = (m["ts_us"] // 1_000_000).to_numpy().astype(np.int64)
        lag = np.where(matched, pts - vts, -1).astype(np.int64)
        return pd.DataFrame({
            "purchase_id": m["event_id"].to_numpy(),
            "user_id": m["user_id"].to_numpy(),
            "view_ts_s": vts,
            "lag_s": lag})

    return keyed.groupby("bucket").map_groups(asof_bucket,
                                              batch_format="pandas")


EVENTS_ASOF_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       COALESCE(CAST(floor(epoch(v.ts)) AS BIGINT), -1) AS view_ts_s,
       COALESCE(CAST(floor(epoch(p.ts)) AS BIGINT)
                - CAST(floor(epoch(v.ts)) AS BIGINT), -1) AS lag_s
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


# ---------------------------------------------------------------------------
# Range join: lineitem rows falling inside derived promo intervals.
# Ray Data has no range join; the portable construction broadcasts the
# (small) interval side sorted by start and resolves membership per batch
# with vectorized searchsorted — valid because the intervals are
# non-overlapping.  For OVERLAPPING intervals the general pattern is
# time-banding: replicate each interval to every band it touches, bin the
# fact rows by band, and join inside each band's group (same coarse-key
# exchange as the joins above).
# ---------------------------------------------------------------------------

def lineitem_promo_revenue(sf_dir: str):
    """Revenue of lineitems shipped inside each 'promo window' — the
    [start+25d, start+35d) slice of every order month (windows derived
    from the orders table, spanning month boundaries so a naive
    month-equality join would be wrong; matched purely on the range
    predicate l_shipdate ∈ [lo, hi))."""
    months = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def month_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["o_orderdate"].dt.to_period("M").dt.start_time \
            .astype("datetime64[us]")   # normalize: start_time is ns-based
        return pd.DataFrame({"month_us": np.unique(m.astype("int64"))})

    month_us = sorted({int(x) for b in months.map_batches(
        month_partial, batch_format="pandas").iter_batches(
            batch_format="pandas") for x in b["month_us"]})
    day_us = 86_400_000_000
    lo = np.array(month_us, dtype=np.int64) + 25 * day_us
    hi = lo + 10 * day_us
    iv_ref = ray.put((lo, hi))

    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_shipdate", "l_extendedprice",
                                  "l_discount"])

    def partial(df: pd.DataFrame, _ref=iv_ref) -> pd.DataFrame:
        lo_a, hi_a = ray.get(_ref)
        ts = df["l_shipdate"].astype("int64").to_numpy()
        idx = np.searchsorted(lo_a, ts, side="right") - 1
        ok = (idx >= 0) & (ts < hi_a[np.clip(idx, 0, len(hi_a) - 1)])
        df = df[ok]
        if df.empty:
            return pd.DataFrame({
                "window_start_s": pd.Series([], dtype=np.int64),
                "rev_u": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64)})
        price = df["l_extendedprice"].to_numpy()
        disc = df["l_discount"].to_numpy()
        t = pd.DataFrame({
            "window_start_s": (lo_a[idx[ok]] // 1_000_000).astype(np.int64),
            "rev_u": _micros(price * (1.0 - disc)),
            "n": np.ones(int(ok.sum()), dtype=np.int64)})
        return t.groupby("window_start_s", as_index=False).sum()

    partials = li.map_batches(partial, batch_format="pandas")
    agg = partials.groupby("window_start_s").aggregate(
        Sum("rev_u", alias_name="rev_u"), Sum("n", alias_name="n_items"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "window_start_s": df["window_start_s"].astype(np.int64),
            "n_items": df["n_items"],
            "revenue": df["rev_u"] / 1_000_000.0})

    return agg.map_batches(finish, batch_format="pandas")


LINEITEM_PROMO_SQL = """
WITH m AS (SELECT DISTINCT date_trunc('month', o_orderdate) AS ms
           FROM orders),
     iv AS (SELECT ms + INTERVAL 25 DAY AS lo, ms + INTERVAL 35 DAY AS hi
            FROM m)
SELECT CAST(floor(epoch(lo)) AS BIGINT) AS window_start_s,
       count(*) AS n_items,
       sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
         /1000000.0 AS revenue
FROM iv JOIN lineitem ON l_shipdate >= lo AND l_shipdate < hi
GROUP BY lo
"""


# ---------------------------------------------------------------------------
# Windowed ranking: top-k events per user (row_number analogue).  The
# training-data shape: per-domain / per-source top documents by score.
# Bucketed fold, same coarse-key pattern as events_sessions — one Ray
# group per bucket, vectorized pandas rank inside.
# ---------------------------------------------------------------------------

def events_user_rank(sf_dir: str, k: int = 3,
                     n_buckets: int | None = None):
    """Top-``k`` events per user by (value desc, event_id asc) with their
    rank — ``row_number() OVER (PARTITION BY user_id ORDER BY ...)``
    without a total sort: events shuffle once by ``user_id % P``; the
    per-user sort+head(k) is a vectorized pandas pass over each bucket.
    ``value`` passes through untouched (bit-identical to the oracle)."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_id", "value"])
    n_buckets = n_buckets or buckets_for(table_bytes(sf_dir, "events"))

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["user_id"].to_numpy() % n_buckets)
            .astype(np.int32),
            "user_id": df["user_id"].to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "value": df["value"].to_numpy()})

    keyed = ds.map_batches(key, batch_format="pandas")

    def rank_bucket(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("user_id", sort=False).head(_k)
        rnk = g.groupby("user_id", sort=False).cumcount().to_numpy() + 1
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy().astype(np.int64),
            "event_id": g["event_id"].to_numpy().astype(np.int64),
            "value": g["value"].to_numpy(),
            "rnk": rnk.astype(np.int64)})

    return keyed.groupby("bucket").map_groups(rank_bucket,
                                              batch_format="pandas")


EVENTS_USER_RANK_SQL = """
SELECT user_id, event_id, value,
       CAST(row_number() OVER (PARTITION BY user_id
            ORDER BY value DESC, event_id) AS BIGINT) AS rnk
FROM events
QUALIFY rnk <= 3
"""


# ---------------------------------------------------------------------------
# Exact distributed COUNT(DISTINCT): two-level exchange — batch-local
# dedup (combiner) → groupby(key, member) collapses global duplicates →
# per-key count of the now-distinct pairs.  The exact companion to the
# HLL sketch in textops.approx_distinct_shingles.
# ---------------------------------------------------------------------------

def events_distinct_users_by_type(sf_dir: str,
                                  n_buckets: int | None = None):
    """``count(DISTINCT user_id)`` per event_type.  Coarse-bucket fold
    (never a groupby over the distinct-pair key space): batch-deduped
    (type, user) pairs shuffle once by ``user_id % P``; a user lives in
    exactly one bucket, so bucket-local distinct pairs are globally
    distinct and the per-type partial counts sum exactly in a tiny final
    groupby.  No driver-side sets at any point."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "user_id"])
    n_buckets = n_buckets or buckets_for(table_bytes(sf_dir, "events"))

    def key(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["event_type", "user_id"])  # combiner
        return pd.DataFrame({
            "bucket": (d["user_id"].to_numpy() % n_buckets)
            .astype(np.int32),
            "event_type": d["event_type"].to_numpy(),
            "user_id": d["user_id"].to_numpy()})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        t = d.groupby("event_type", as_index=False).size()
        return pd.DataFrame({"event_type": t["event_type"],
                             "n": t["size"].astype(np.int64)})

    partials = ds.map_batches(key, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas")
    # partials are bounded (≤ P × |event types| rows) → finish locally
    # instead of paying a second exchange barrier
    out = partials.to_pandas().groupby("event_type", as_index=False)["n"] \
        .sum().rename(columns={"n": "n_users"})
    out["n_users"] = out["n_users"].astype(np.int64)
    return out


EVENTS_DISTINCT_USERS_SQL = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join: the shuffle-byte reducer for selective
# semi/anti joins at 100 TB.  The fact side's keys fold into a MERGEABLE
# bit array (one row per batch, OR-reduced — same mergeable-sketch shape
# as textops' HLL), the small bitmap broadcasts via ray.put, and the dim
# side drops every row whose key misses the filter BEFORE the bucketed
# exchange.  False positives (~|keys|/m bits set → (1-e^-kn/m)^k) are
# removed by the exact per-bucket verify, so results are EXACT — the
# bloom only prunes exchange bytes.  Public construction (Bloom 1970).
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 20          # 128 KiB bitmap; size m ~ 10 bits/key
_BLOOM_K = 4


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, K) bit positions via independent multiplicative mixes."""
    k = keys.astype(np.uint64)
    consts = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0xD6E8FEB86659FD93],
                      dtype=np.uint64)[:_BLOOM_K]
    mixed = k[:, None] * consts[None, :]
    return ((mixed >> np.uint64(40)) % np.uint64(_BLOOM_BITS)) \
        .astype(np.int64)


def semi_join_customers_bloom(sf_dir: str):
    """Same result as ``semi_join_customers_with_orders`` (and the same
    DuckDB oracle), with a bloom prefilter on the customer side:

    1. build: per-batch order-key bitmaps (np.uint8), OR-merged into one
       128 KiB filter on the driver (bounded regardless of fact size;
       the merge is associative — at cluster scale do a tree reduce).
    2. prune: customers failing the filter drop before the exchange —
       at a selective join this removes most of the shuffled bytes.
    3. exact verify: the surviving pairs run the same bucketed semi
       join, so bloom false positives cannot leak into the result.
    """
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])

    def build(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(_BLOOM_BITS, dtype=bool)
        pos = _bloom_positions(pd.unique(df["o_custkey"]))
        bits[pos.reshape(-1)] = True
        return pd.DataFrame({"bits": [np.packbits(bits)]})

    merged = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for b in orders.map_batches(build, batch_format="pandas") \
            .iter_batches(batch_format="pandas"):
        for arr in b["bits"]:
            np.bitwise_or(merged, np.asarray(arr, dtype=np.uint8),
                          out=merged)
    bloom_ref = ray.put(merged)

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name"])
    n_buckets = buckets_for(table_bytes(sf_dir, "orders"))

    def key_cust(df: pd.DataFrame, _ref=bloom_ref) -> pd.DataFrame:
        bits = np.unpackbits(ray.get(_ref)).view(bool)
        pos = _bloom_positions(df["c_custkey"].to_numpy())
        maybe = bits[pos].all(axis=1)
        df = df[maybe]
        return pd.DataFrame({
            "bucket": (df["c_custkey"].to_numpy() % n_buckets)
            .astype(np.int32),
            "custkey": df["c_custkey"].to_numpy(),
            "c_name": df["c_name"].astype(object),
            "side": np.zeros(len(df), dtype=np.int8)})

    def key_orders(df: pd.DataFrame) -> pd.DataFrame:
        ks = pd.unique(df["o_custkey"])
        return pd.DataFrame({
            "bucket": (ks % n_buckets).astype(np.int32),
            "custkey": ks,
            "c_name": np.full(len(ks), "", dtype=object),
            "side": np.ones(len(ks), dtype=np.int8)})

    both = cust.map_batches(key_cust, batch_format="pandas").union(
        orders.map_batches(key_orders, batch_format="pandas"))

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        have = set(g.loc[g["side"] == 1, "custkey"])
        c = g[g["side"] == 0]
        c = c[c["custkey"].isin(have)]
        return pd.DataFrame({
            "c_custkey": c["custkey"].to_numpy().astype(np.int64),
            "c_name": c["c_name"].astype(object)})

    return both.groupby("bucket").map_groups(filter_bucket,
                                             batch_format="pandas")


# ---------------------------------------------------------------------------
# Q5-style 6-table join chain: revenue per nation within a region, orders
# in a date window, customer and supplier in the SAME nation.  The widest
# relational pipeline in the engine — three chained bucketed fact-fact
# exchanges (custkey → orderkey → suppkey), each re-keying the slim join
# state only, with the tiny region/nation dimensions broadcast once.
# ---------------------------------------------------------------------------

def q5_region_revenue(sf_dir: str, region: str = "ASIA",
                      date_lo: str = "1996-01-01",
                      date_hi: str = "1997-01-01"):
    """TPC-H Q5 shape, scale-honest: no big side is ever broadcast.

    - region ⋈ nation is driver-side (≤ 25 rows): yields the region's
      nationkey set + names, broadcast via ``ray.put``.
    - orders (date-filtered, slim) ⋈ customer (region-filtered, slim) is
      a bucketed hash join on custkey — customer is a FACT at TPC-H
      scale (1.5M·SF rows), so it buckets, never broadcasts.
    - result ⋈ lineitem is a bucketed join on orderkey; lineitem carries
      (suppkey, rev_micros) only.
    - result ⋈ supplier is a bucketed join on suppkey (supplier =
      10k·SF rows — 10^9 at the 100 TB point, far past broadcast range)
      applying the c_nationkey == s_nationkey equality per bucket, with
      per-bucket partial (nationkey, rev) aggregation so the final
      groupby is ≤ 25·P rows.
    - revenue summed as exact int64 micros (module design rule), one
      final division — bit-equal to the SQL oracle.
    """
    lo = pd.Timestamp(date_lo)
    hi = pd.Timestamp(date_hi)
    nat = pq.read_table(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(_t(sf_dir, "region"),
                        columns=["r_regionkey", "r_name"])
    rk = {r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region}
    names = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()
             if r["n_regionkey"] in rk}
    nk_ref = checked_put(names, "region nation names")
    nb_cust = buckets_for(table_bytes(sf_dir, "customer"))
    nb_li = buckets_for(table_bytes(sf_dir, "lineitem"))
    nb_supp = buckets_for(table_bytes(sf_dir, "supplier"))

    # --- exchange 1: orders ⋈ customer on custkey --------------------------
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def key_orders(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        return pd.DataFrame({
            "bucket": (df["o_custkey"].to_numpy() % nb_cust)
            .astype(np.int32),
            "custkey": df["o_custkey"].to_numpy(),
            "orderkey": df["o_orderkey"].to_numpy(),
            "nationkey": np.zeros(len(df), dtype=np.int64),
            "side": np.zeros(len(df), dtype=np.int8)})

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])

    def key_cust(df: pd.DataFrame, _ref=nk_ref) -> pd.DataFrame:
        keep = ray.get(_ref)            # per-worker plasma-cached dim
        df = df[df["c_nationkey"].isin(keep)]
        return pd.DataFrame({
            "bucket": (df["c_custkey"].to_numpy() % nb_cust)
            .astype(np.int32),
            "custkey": df["c_custkey"].to_numpy(),
            "orderkey": np.zeros(len(df), dtype=np.int64),
            "nationkey": df["c_nationkey"].to_numpy().astype(np.int64),
            "side": np.ones(len(df), dtype=np.int8)})

    oc = orders.map_batches(key_orders, batch_format="pandas").union(
        cust.map_batches(key_cust, batch_format="pandas"))

    def join_oc(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["custkey", "orderkey"]]
        right = g[g["side"] == 1][["custkey", "nationkey"]]
        m = left.merge(right, on="custkey", how="inner")
        return pd.DataFrame({
            "bucket": (m["orderkey"].to_numpy() % nb_li).astype(np.int32),
            "orderkey": m["orderkey"].to_numpy().astype(np.int64),
            "nationkey": m["nationkey"].to_numpy().astype(np.int64),
            "suppkey": np.zeros(len(m), dtype=np.int64),
            "rev_u": np.zeros(len(m), dtype=np.int64),
            "side": np.zeros(len(m), dtype=np.int8)})

    stage1 = oc.groupby("bucket").map_groups(join_oc, batch_format="pandas")

    # --- exchange 2: ⋈ lineitem on orderkey --------------------------------
    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def key_li(df: pd.DataFrame) -> pd.DataFrame:
        price = df["l_extendedprice"].to_numpy()
        disc = df["l_discount"].to_numpy()
        t = pd.DataFrame({
            "orderkey": df["l_orderkey"].to_numpy(),
            "suppkey": df["l_suppkey"].to_numpy(),
            "rev_u": _micros(price * (1.0 - disc))})
        t = t.groupby(["orderkey", "suppkey"], as_index=False).sum()
        return pd.DataFrame({
            "bucket": (t["orderkey"].to_numpy() % nb_li).astype(np.int32),
            "orderkey": t["orderkey"].to_numpy(),
            "nationkey": np.zeros(len(t), dtype=np.int64),
            "suppkey": t["suppkey"].to_numpy().astype(np.int64),
            "rev_u": t["rev_u"].to_numpy().astype(np.int64),
            "side": np.ones(len(t), dtype=np.int8)})

    ol = stage1.union(li.map_batches(key_li, batch_format="pandas",
                                     batch_size=16384))

    def join_ol(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["orderkey", "nationkey"]]
        right = g[g["side"] == 1][["orderkey", "suppkey", "rev_u"]]
        m = left.merge(right, on="orderkey", how="inner")
        # combiner for exchange 3: partial per (suppkey, cust nation)
        m = m.groupby(["suppkey", "nationkey"], as_index=False)[
            "rev_u"].sum()
        return pd.DataFrame({
            "bucket": (m["suppkey"].to_numpy() % nb_supp).astype(np.int32),
            "suppkey": m["suppkey"].to_numpy().astype(np.int64),
            "nationkey": m["nationkey"].to_numpy().astype(np.int64),
            "rev_u": m["rev_u"].to_numpy().astype(np.int64),
            "side": np.zeros(len(m), dtype=np.int8)})

    stage2 = ol.groupby("bucket").map_groups(join_ol, batch_format="pandas")

    # --- exchange 3: ⋈ supplier on suppkey (same-nation condition) ---------
    supp = rd.read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_nationkey"])

    def key_supp(df: pd.DataFrame, _ref=nk_ref) -> pd.DataFrame:
        keep = ray.get(_ref)
        df = df[df["s_nationkey"].isin(keep)]
        return pd.DataFrame({
            "bucket": (df["s_suppkey"].to_numpy() % nb_supp)
            .astype(np.int32),
            "suppkey": df["s_suppkey"].to_numpy(),
            "nationkey": df["s_nationkey"].to_numpy().astype(np.int64),
            "rev_u": np.zeros(len(df), dtype=np.int64),
            "side": np.ones(len(df), dtype=np.int8)})

    sl = stage2.union(supp.map_batches(key_supp, batch_format="pandas"))

    def join_supp(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["suppkey", "nationkey", "rev_u"]]
        right = g[g["side"] == 1][["suppkey", "nationkey"]]
        m = left.merge(right, on=["suppkey", "nationkey"], how="inner")
        m = m.groupby("nationkey", as_index=False)["rev_u"].sum()
        return pd.DataFrame({
            "nationkey": m["nationkey"].to_numpy().astype(np.int64),
            "rev_u": m["rev_u"].to_numpy().astype(np.int64)})

    per_bucket = sl.groupby("bucket").map_groups(join_supp,
                                                 batch_format="pandas")
    # per-bucket partials are bounded by construction (≤ |region nations|
    # ≤ 25 rows per bucket) — finish on the driver like coarse_topk_counts
    # rather than paying two more all-to-alls (Aggregate + sort) on ≤25·P
    # rows
    part = per_bucket.to_pandas()
    agg = part.groupby("nationkey", as_index=False)["rev_u"].sum()
    out = pd.DataFrame({
        "n_name": agg["nationkey"].map(names).astype(object),
        "revenue": agg["rev_u"].to_numpy(np.int64) / 1_000_000.0})
    out = out.sort_values(["revenue", "n_name"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


Q5_SQL = """
SELECT n_name,
  sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
    / 1000000.0 AS revenue
FROM region JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Per-user inter-event gap statistics (lag/lead window shape): same
# coarse-bucket fold as events_sessions — a user's whole history lives in
# one bucket task, gaps are a vectorized diff, the exchange moves slim
# (bucket, user, ts) rows once.
# ---------------------------------------------------------------------------

def events_gap_stats(sf_dir: str, n_buckets: int | None = None):
    """Per-user event-gap profile: count, max gap, mean gap — the
    lag()-window op (feed freshness / engagement cadence).  Gaps in exact
    integer microseconds; ``mean_gap_s`` is two IEEE divisions of exact
    ints evaluated in the same order as the SQL oracle.  Users with one
    event have no gap and are excluded (mirrors HAVING count(*) >= 2)."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "events"))
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_id", "ts"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["user_id"].to_numpy() % n_b).astype(np.int32),
            "user_id": df["user_id"].to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "ts_us": df["ts"].astype("int64").to_numpy()})

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        same = uid[1:] == uid[:-1]
        gaps = np.diff(ts)
        t = pd.DataFrame({"user_id": uid[1:][same],
                          "gap_us": gaps[same]})
        n_ev = pd.Series(uid).value_counts()
        agg = t.groupby("user_id").agg(
            n_gaps=("gap_us", "size"), max_gap_us=("gap_us", "max"),
            sum_gap_us=("gap_us", "sum"))
        agg["n_events"] = n_ev.reindex(agg.index).to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": agg.index.to_numpy().astype(np.int64),
            "n_events": agg["n_events"].to_numpy(np.int64),
            "max_gap_us": agg["max_gap_us"].to_numpy(np.int64),
            "mean_gap_s": agg["sum_gap_us"].to_numpy(np.float64)
            / agg["n_gaps"].to_numpy(np.float64) / 1_000_000.0})

    return keyed.groupby("bucket").map_groups(fold, batch_format="pandas")


EVENTS_GAP_SQL = """
WITH d AS (
  SELECT user_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
  CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 1000000.0 AS mean_gap_s
FROM d GROUP BY user_id HAVING count(*) >= 2
"""


# ---------------------------------------------------------------------------
# Ordered funnel analysis (view → click → purchase): the product-analytics
# staple over an event log.  Same partitioning contract as sessions/gaps —
# a user's full history lives in one bucket task — with per-bucket partial
# stage counts, so the driver sees P scalar triples, never users.
# ---------------------------------------------------------------------------

def events_funnel(sf_dir: str, steps=("view", "click", "purchase"),
                  n_buckets: int | None = None):
    """Strict-order funnel: a user converts step i iff an event of type
    ``steps[i]`` occurs strictly AFTER their earliest conversion time of
    step i-1 (min-ts semantics, deterministic — no ts tie ambiguity:
    strictly-greater on exact int64 microseconds both here and in the
    oracle).  Returns one row of per-step converted-user counts."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "events"))
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts"])
    step_ix = {s: i for i, s in enumerate(steps)}

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(step_ix)]
        return pd.DataFrame({
            "bucket": (df["user_id"].to_numpy() % n_b).astype(np.int32),
            "user_id": df["user_id"].to_numpy(),
            "step": df["event_type"].map(step_ix).to_numpy(np.int8),
            "ts_us": df["ts"].astype("int64").to_numpy()})

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold(g: pd.DataFrame, _n=len(steps)) -> pd.DataFrame:
        counts = np.zeros(_n, dtype=np.int64)
        for _, u in g.groupby("user_id", sort=False):
            t_prev = -1
            for i in range(_n):
                ts = u.loc[(u["step"] == i) & (u["ts_us"] > t_prev),
                           "ts_us"]
                if ts.empty:
                    break
                t_prev = int(ts.min())
                counts[i] += 1
        return pd.DataFrame({"step": np.arange(_n, dtype=np.int64),
                             "n_users": counts})

    part = keyed.groupby("bucket").map_groups(fold, batch_format="pandas")
    # P×n_steps scalar partials — bounded by construction; finish local
    tot = part.to_pandas().groupby("step")["n_users"].sum()
    return pa.table({
        "step_name": pa.array(list(steps), pa.string()),
        "n_users": pa.array([int(tot.get(i, 0)) for i in range(len(steps))],
                            pa.int64())})


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id)
SELECT step_name, n_users FROM (
  SELECT 'view' AS step_name, (SELECT count(*) FROM v) AS n_users, 0 AS o
  UNION ALL
  SELECT 'click', (SELECT count(*) FROM c), 1
  UNION ALL
  SELECT 'purchase', (SELECT count(*) FROM p), 2) ORDER BY o
"""


# ---------------------------------------------------------------------------
# Grouped top-k (top suppliers per nation): the per-group QUALIFY shape.
# Combiner per batch (each batch contributes ≤ groups·k rows), one
# bucketed exchange by group key, per-bucket per-group merge — exact for
# any group cardinality, no total sort, no driver materialization.
# ---------------------------------------------------------------------------

def supplier_topk_per_nation(sf_dir: str, k: int = 3,
                             n_buckets: int | None = None):
    """Top-``k`` suppliers by account balance per nation (ties broken by
    suppkey asc).  A group's rows all land in one bucket, so the
    bucket-local per-group head(k) is globally exact; the per-batch
    partial head(k) is the combiner that bounds the exchange at
    groups·k rows per batch regardless of fact size."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "supplier"))
    ds = rd.read_parquet(_t(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_name", "s_nationkey",
                                  "s_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["s_nationkey", "s_acctbal", "s_suppkey"],
                            ascending=[True, False, True],
                            kind="mergesort")
        df = df.groupby("s_nationkey", sort=False).head(k)
        return df.assign(
            bucket=(df["s_nationkey"].to_numpy() % n_b).astype(np.int32))

    parts = ds.map_batches(partial, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["s_nationkey", "s_acctbal", "s_suppkey"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("s_nationkey", sort=False).head(k)
        rk = g.groupby("s_nationkey", sort=False).cumcount() + 1
        return pd.DataFrame({
            "s_nationkey": g["s_nationkey"].to_numpy(),
            "s_suppkey": g["s_suppkey"].to_numpy(np.int64),
            "s_name": g["s_name"].astype(object),
            "s_acctbal": g["s_acctbal"].to_numpy(np.float64),
            "rk": rk.to_numpy(np.int64)})

    return parts.groupby("bucket").map_groups(fold, batch_format="pandas")


SUPPLIER_TOPK_SQL = """
SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
  CAST(row_number() OVER (PARTITION BY s_nationkey
       ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rk
FROM supplier
QUALIFY rk <= 3
"""


# ---------------------------------------------------------------------------
# Per-customer running revenue total (grouped prefix sum / cumulative
# window): per-group ordered scan inside the coarse-bucket fold, exact
# int64 cents so the cumulative double matches the oracle bit-for-bit.
# ---------------------------------------------------------------------------

def orders_running_total(sf_dir: str, n_buckets: int | None = None):
    """Cumulative order spend per customer in (o_orderdate, o_orderkey)
    order — the grouped prefix-sum window op (lifetime-value curves).
    A customer's orders co-locate in one bucket; the fold sorts the
    group once and cumsums exact cents."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "orders"))
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["o_custkey"].to_numpy() % n_b).astype(np.int32),
            "o_custkey": df["o_custkey"].to_numpy(),
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "date_us": df["o_orderdate"].astype("int64").to_numpy(),
            "price_c": _cents(df["o_totalprice"])})

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "date_us", "o_orderkey"],
                          kind="mergesort")
        cum = g.groupby("o_custkey", sort=False)["price_c"].cumsum() \
            .to_numpy(np.int64)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy(np.int64),
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "cum_spend": cum / 100.0})

    return keyed.groupby("bucket").map_groups(fold, batch_format="pandas")


ORDERS_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
  sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) / 100.0
    AS cum_spend
FROM orders
"""


# ---------------------------------------------------------------------------
# Per-user lag delta (LAG window): value change vs the user's previous
# event.  Same coarse-bucket contract as gap_stats — one exchange of slim
# keyed rows, per-bucket vectorized diff, no per-user Python loop.
# ---------------------------------------------------------------------------

def events_lag_delta(sf_dir: str, n_buckets: int | None = None):
    """Per-event ``value - lag(value)`` within user history ordered by
    (ts, event_id).  Rows without a predecessor are dropped (inner-lag),
    so no NULL-vs-NaN ambiguity against the oracle; the delta is one IEEE
    subtraction of the same two doubles on both engines — bit-exact."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "events"))
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["user_id"].to_numpy() % n_b).astype(np.int32),
            "user_id": df["user_id"].to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "ts_us": df["ts"].astype("int64").to_numpy(),
            "value": df["value"].to_numpy(np.float64)})

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy()
        val = g["value"].to_numpy()
        prev_same = np.empty(len(g), dtype=bool)
        prev_same[0] = False
        prev_same[1:] = uid[1:] == uid[:-1]
        delta = np.empty(len(g), dtype=np.float64)
        delta[1:] = val[1:] - val[:-1]
        out = pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid.astype(np.int64),
            "delta": delta})
        return out[prev_same]

    return keyed.groupby("bucket").map_groups(fold, batch_format="pandas")


EVENTS_LAG_DELTA_SQL = """
SELECT event_id, user_id, delta FROM (
  SELECT event_id, user_id,
    value - lag(value) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events) WHERE delta IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Grouped NTILE (quartiles of customers per nation): the windowed
# bucketing op behind per-cohort percentile labels.  Exact NTILE
# semantics (first ``size % n`` tiles get the extra row) reproduced
# vectorized inside the per-group fold.
# ---------------------------------------------------------------------------

def customer_ntile_by_nation(sf_dir: str, n_tiles: int = 4,
                             n_buckets: int | None = None):
    """NTILE(``n_tiles``) of customers per nation, ordered by acctbal
    desc (tie: custkey asc).  A nation's customers co-locate in one
    bucket; the fold ranks each group and assigns tiles arithmetically —
    no global sort, the exchange moves (bucket, custkey, balance)."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "customer"))
    ds = rd.read_parquet(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            bucket=(df["c_nationkey"].to_numpy() % n_b).astype(np.int32))

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold(g: pd.DataFrame, _n=n_tiles) -> pd.DataFrame:
        g = g.sort_values(["c_nationkey", "c_acctbal", "c_custkey"],
                          ascending=[True, False, True], kind="mergesort")
        rank0 = g.groupby("c_nationkey", sort=False).cumcount().to_numpy()
        size = g.groupby("c_nationkey", sort=False)["c_custkey"] \
            .transform("size").to_numpy()
        # NTILE: base rows per tile q = size // n, first r = size % n
        # tiles hold q+1.  Row at 0-based rank i lands in tile:
        q, r = size // _n, size % _n
        big = (q + 1) * r                       # rows covered by big tiles
        in_big = rank0 < big
        tile = np.where(in_big,
                        rank0 // np.maximum(q + 1, 1),
                        np.where(q > 0, r + (rank0 - big) // np.maximum(q, 1), 0))
        return pd.DataFrame({
            "c_custkey": g["c_custkey"].to_numpy(np.int64),
            "c_nationkey": g["c_nationkey"].to_numpy(np.int64),
            "c_acctbal": g["c_acctbal"].to_numpy(np.float64),
            "tile": (tile + 1).astype(np.int64)})

    return keyed.groupby("bucket").map_groups(fold, batch_format="pandas")


CUSTOMER_NTILE_SQL = """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal,
  CAST(ntile(4) OVER (PARTITION BY c_nationkey
       ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS tile
FROM customer
"""


# ---------------------------------------------------------------------------
# Pivot (long → wide): daily event counts, one column per event type.
# A pivot with a KNOWN column set is just a conditional partial
# aggregation — each batch emits ≤ days-touched rows with per-type
# counts, the groupby merges partials, no row ever carries strings past
# the first map.
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ("view", "click", "purchase", "signup", "error")


def events_pivot_daily(sf_dir: str):
    """Daily pivot of the event log: one row per UTC day with per-type
    event counts (fixed, declared column set — the scale-safe pivot;
    dynamic pivots need a distinct-keys pass first)."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("int64").to_numpy()
        day = (us // 86_400_000_000) * 86_400          # epoch seconds
        t = pd.DataFrame({"day_start": day})
        et = df["event_type"].to_numpy()
        for name in _PIVOT_TYPES:
            t[f"n_{name}"] = (et == name).astype(np.int64)
        return t.groupby("day_start", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("day_start").aggregate(
        *[Sum(f"n_{n}", alias_name=f"n_{n}") for n in _PIVOT_TYPES])


EVENTS_PIVOT_SQL = """
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
  sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS n_view,
  sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS n_click,
  sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS n_purchase,
  sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS n_signup,
  sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS n_error
FROM events GROUP BY day_start
"""


# ---------------------------------------------------------------------------
# Exact-moment Pearson correlation per group: the single-pass moment
# pattern (n, Σx, Σy, Σxy, Σx², Σy²) with every moment an exact integer
# (quantity units, price cents), combined with arbitrary-precision ints
# in the per-group fold so the final float expression is evaluated once,
# in the same operation order as the oracle — bit-exact, no Welford
# drift, summation-order-free.
# ---------------------------------------------------------------------------

def lineitem_corr(sf_dir: str):
    """corr(l_quantity, l_extendedprice) per l_returnflag via exact
    integer moments.  Per-batch int64 partials (batch_size capped so
    Σy² cannot overflow), per-group Python-int combine (exact at any
    partial count), one closed-form float expression at the end —
    ``a / sqrt(b) / sqrt(c)`` with a,b,c exact — mirrored verbatim in
    the SQL oracle over DuckDB HUGEINT moments."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        y = _cents(df["l_extendedprice"])
        t = pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "n": np.ones(len(df), dtype=np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x, "syy": y * y})
        return t.groupby("l_returnflag", as_index=False).sum()

    # syy per row ≤ ~1e14; 8192-row batches keep the int64 partial ≤ ~1e18
    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=8192)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # Python ints: exact regardless of how many partials accumulate
        n = int(sum(int(v) for v in g["n"]))
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxy = sum(int(v) for v in g["sxy"])
        sxx = sum(int(v) for v in g["sxx"])
        syy = sum(int(v) for v in g["syy"])
        a = n * sxy - sx * sy
        b = n * sxx - sx * sx
        c = n * syy - sy * sy
        import math
        corr = float(a) / math.sqrt(float(b)) / math.sqrt(float(c))
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]],
                             "corr_qty_price": [corr]})

    return partials.groupby("l_returnflag").map_groups(
        fold, batch_format="pandas")


LINEITEM_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
    count(*) AS n,
    sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
    sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS sy,
    sum(CAST(round(l_quantity) AS BIGINT)
        * CAST(round(l_extendedprice*100) AS BIGINT)) AS sxy,
    sum(CAST(round(l_quantity) AS BIGINT)
        * CAST(round(l_quantity) AS BIGINT)) AS sxx,
    sum(CAST(round(l_extendedprice*100) AS BIGINT)
        * CAST(round(l_extendedprice*100) AS BIGINT)) AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
  CAST(n*sxy - sx*sy AS DOUBLE)
    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
    / sqrt(CAST(n*syy - sy*sy AS DOUBLE)) AS corr_qty_price
FROM m
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape (top customers by returned-item revenue): the
# fact-fact-fact chain — lineitem(filtered) ⋈ orders(quarter) on
# orderkey, partial-agg per custkey, ⋈ customer on custkey (customer is
# a fact: bucketed, never broadcast), nation name from a ≤25-row
# broadcast dict, global top-k via per-bucket head(k) + small merge.
# ---------------------------------------------------------------------------

def q10_returned_revenue(sf_dir: str, date_lo: str = "1996-07-01",
                         date_hi: str = "1996-10-01", k: int = 20,
                         n_buckets: int | None = None):
    """Revenue lost to returns per customer for one quarter's orders
    (l_returnflag = 'R'), top-``k`` customers.  Exact int64 micros
    through both exchanges; ties broken by custkey asc."""
    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    nb_ord = n_buckets or buckets_for(table_bytes(sf_dir, "lineitem"))
    nb_cust = n_buckets or buckets_for(table_bytes(sf_dir, "customer"))
    names = {r["n_nationkey"]: r["n_name"]
             for r in pq.read_table(
                 _t(sf_dir, "nation"),
                 columns=["n_nationkey", "n_name"]).to_pylist()}
    names_ref = checked_put(names, "nation names")

    # --- exchange 1: lineitem('R') ⋈ orders(quarter) on orderkey ----------
    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"])

    def key_li(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_returnflag"] == "R"]
        price = df["l_extendedprice"].to_numpy()
        disc = df["l_discount"].to_numpy()
        t = pd.DataFrame({"orderkey": df["l_orderkey"].to_numpy(),
                          "rev_u": _micros(price * (1.0 - disc))})
        t = t.groupby("orderkey", as_index=False).sum()
        return pd.DataFrame({
            "bucket": (t["orderkey"].to_numpy() % nb_ord).astype(np.int32),
            "orderkey": t["orderkey"].to_numpy(),
            "custkey": np.zeros(len(t), dtype=np.int64),
            "rev_u": t["rev_u"].to_numpy(np.int64),
            "side": np.zeros(len(t), dtype=np.int8)})

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def key_ord(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        return pd.DataFrame({
            "bucket": (df["o_orderkey"].to_numpy() % nb_ord)
            .astype(np.int32),
            "orderkey": df["o_orderkey"].to_numpy(),
            "custkey": df["o_custkey"].to_numpy().astype(np.int64),
            "rev_u": np.zeros(len(df), dtype=np.int64),
            "side": np.ones(len(df), dtype=np.int8)})

    lo_ds = li.map_batches(key_li, batch_format="pandas", batch_size=16384)
    ro_ds = orders.map_batches(key_ord, batch_format="pandas")

    def join_lo(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["orderkey", "rev_u"]]
        right = g[g["side"] == 1][["orderkey", "custkey"]]
        m = left.merge(right, on="orderkey", how="inner")
        m = m.groupby("custkey", as_index=False)["rev_u"].sum()
        return pd.DataFrame({
            "bucket": (m["custkey"].to_numpy() % nb_cust).astype(np.int32),
            "custkey": m["custkey"].to_numpy(np.int64),
            "rev_u": m["rev_u"].to_numpy(np.int64),
            "nationkey": np.zeros(len(m), dtype=np.int64),
            "side": np.zeros(len(m), dtype=np.int8)})

    stage1 = lo_ds.union(ro_ds).groupby("bucket").map_groups(
        join_lo, batch_format="pandas")

    # --- exchange 2: ⋈ customer on custkey --------------------------------
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name", "c_nationkey"])

    def key_cust(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["c_custkey"].to_numpy() % nb_cust)
            .astype(np.int32),
            "custkey": df["c_custkey"].to_numpy(np.int64),
            "rev_u": np.zeros(len(df), dtype=np.int64),
            "nationkey": df["c_nationkey"].to_numpy().astype(np.int64),
            "side": np.ones(len(df), dtype=np.int8),
            "c_name": df["c_name"].astype(object)})

    cu = stage1.map_batches(
        lambda df: df.assign(c_name=np.full(len(df), "", dtype=object)),
        batch_format="pandas").union(
        cust.map_batches(key_cust, batch_format="pandas"))

    def join_cu(g: pd.DataFrame, _ref=names_ref, _k=k) -> pd.DataFrame:
        names = ray.get(_ref)
        left = g[g["side"] == 0][["custkey", "rev_u"]]
        left = left.groupby("custkey", as_index=False).sum()
        right = g[g["side"] == 1][["custkey", "c_name", "nationkey"]]
        m = left.merge(right, on="custkey", how="inner")
        m = m.sort_values(["rev_u", "custkey"], ascending=[False, True],
                          kind="mergesort").head(_k)
        return pd.DataFrame({
            "c_custkey": m["custkey"].to_numpy(np.int64),
            "c_name": m["c_name"].astype(object),
            "n_name": m["nationkey"].map(names).astype(object),
            "rev_u": m["rev_u"].to_numpy(np.int64)})

    per_bucket = cu.groupby("bucket").map_groups(join_cu,
                                                 batch_format="pandas")
    # ≤ k rows per bucket survive — small merge, exact global top-k
    top = per_bucket.sort(["rev_u", "c_custkey"],
                          descending=[True, False]).limit(k)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"],
            "c_name": df["c_name"],
            "n_name": df["n_name"],
            "revenue": df["rev_u"].to_numpy(np.int64) / 1_000_000.0})

    return top.map_batches(finish, batch_format="pandas")


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
  sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
    / 1000000.0 AS revenue
FROM customer JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
  DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Per-user rolling time-range average (RANGE BETWEEN ... PRECEDING):
# trailing 1-hour mean of event values.  Same one-exchange coarse-bucket
# contract; inside the fold the trailing window is two vectorized
# searchsorted prefix-sum lookups per user run — O(n log n) for the
# sort, O(n) for the windows, no per-row Python.
# ---------------------------------------------------------------------------

def events_rolling_avg(sf_dir: str, window_s: int = 3600,
                       n_buckets: int | None = None):
    """Per-event trailing mean of ``value`` over the user's events in
    ``[ts - window_s, ts]`` (inclusive bounds — RANGE-window semantics).
    Sums are exact int64 micros; the mean is one IEEE division mirrored
    by the oracle, so ties in summation order cannot split the hash."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "events"))
    w_us = window_s * 1_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["user_id"].to_numpy() % n_b).astype(np.int32),
            "user_id": df["user_id"].to_numpy(),
            "event_id": df["event_id"].to_numpy(),
            "ts_us": df["ts"].astype("int64").to_numpy(),
            "v_u": _micros(df["value"])})

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        v = g["v_u"].to_numpy()
        out_sum = np.empty(len(g), dtype=np.int64)
        out_n = np.empty(len(g), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        bounds = np.r_[starts, len(g)]
        for i in range(len(starts)):          # per-user RUN, not per-row
            lo, hi = bounds[i], bounds[i + 1]
            t, vv = ts[lo:hi], v[lo:hi]
            csum = np.r_[0, np.cumsum(vv)]
            left = np.searchsorted(t, t - w_us, side="left")
            # RANGE ... CURRENT ROW includes ts-peers, so the window's
            # upper edge is the right bisect of the row's own ts
            right = np.searchsorted(t, t, side="right")
            out_sum[lo:hi] = csum[right] - csum[left]
            out_n[lo:hi] = right - left
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid.astype(np.int64),
            "n_in_window": out_n,
            "avg_value": out_sum / 1_000_000.0 / out_n})

    return keyed.groupby("bucket").map_groups(fold, batch_format="pandas")


EVENTS_ROLLING_SQL = """
SELECT event_id, user_id,
  CAST(count(*) OVER w AS BIGINT) AS n_in_window,
  sum(CAST(round(value*1000000) AS BIGINT)) OVER w / 1000000.0
    / count(*) OVER w AS avg_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# ROLLUP (grouping sets): revenue by (returnflag, linestatus) with
# per-flag subtotals and a grand total.  One pass: the per-batch partial
# emits a row into EVERY grouping set (3 sets → ≤ 3·distinct rows per
# batch), the small groupby merges — no second scan per set, which is
# the scale trick (the naive plan reads the fact table once per set).
# ---------------------------------------------------------------------------

_ROLLUP_TOTAL = "__ALL__"


def lineitem_rollup(sf_dir: str):
    """Revenue rollup over (l_returnflag, l_linestatus): detail rows,
    per-returnflag subtotals, grand total.  Subtotal levels carry the
    sentinel ``__ALL__`` (NULL-free so hash compare is unambiguous).
    Exact int64 micros throughout."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_linestatus",
                                  "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = _micros(df["l_extendedprice"].to_numpy()
                      * (1.0 - df["l_discount"].to_numpy()))
        base = pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "l_linestatus": df["l_linestatus"].to_numpy(),
            "rev_u": rev, "n": np.ones(len(df), dtype=np.int64)})
        detail = base.groupby(["l_returnflag", "l_linestatus"],
                              as_index=False).sum()
        sub = detail.assign(l_linestatus=_ROLLUP_TOTAL).groupby(
            ["l_returnflag", "l_linestatus"], as_index=False).sum()
        total = sub.assign(l_returnflag=_ROLLUP_TOTAL).groupby(
            ["l_returnflag", "l_linestatus"], as_index=False).sum()
        return pd.concat([detail, sub, total], ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("rev_u", alias_name="rev_u"), Sum("n", alias_name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "n_items": df["n"],
            "revenue": df["rev_u"] / 1_000_000.0})

    return agg.map_batches(finish, batch_format="pandas")


LINEITEM_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, '__ALL__') AS l_returnflag,
       coalesce(l_linestatus, '__ALL__') AS l_linestatus,
       count(*) AS n_items,
       sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
         / 1000000.0 AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# Grouped mode (most frequent brand per part type): exact distributed
# mode via per-batch (type, brand) partial counts → one small groupby →
# per-type argmax fold.  The exchange moves counts, never part rows.
# ---------------------------------------------------------------------------

def part_mode_brand(sf_dir: str, n_buckets: int | None = None):
    """Most frequent p_brand per p_type (tie: lexicographically first
    brand) plus its count — the grouped-mode aggregate."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "part"))
    ds = rd.read_parquet(_t(sf_dir, "part"),
                         columns=["p_type", "p_brand"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"p_type": df["p_type"].to_numpy(),
                          "p_brand": df["p_brand"].to_numpy(),
                          "n": np.ones(len(df), dtype=np.int64)})
        t = t.groupby(["p_type", "p_brand"], as_index=False).sum()
        h = pd.util.hash_pandas_object(t["p_type"].astype(str),
                                       index=False).to_numpy()
        return t.assign(bucket=(h % n_b).astype(np.int32))

    partials = ds.map_batches(partial, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["p_type", "p_brand"], as_index=False)["n"].sum()
        g = g.sort_values(["p_type", "n", "p_brand"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("p_type", sort=False).head(1)
        return pd.DataFrame({
            "p_type": g["p_type"].astype(object),
            "mode_brand": g["p_brand"].astype(object),
            "n_parts": g["n"].to_numpy(np.int64)})

    return partials.groupby("bucket").map_groups(fold,
                                                 batch_format="pandas")


PART_MODE_SQL = """
SELECT p_type, p_brand AS mode_brand, CAST(n AS BIGINT) AS n_parts FROM (
  SELECT p_type, p_brand, count(*) AS n,
    row_number() OVER (PARTITION BY p_type
        ORDER BY count(*) DESC, p_brand) AS rk
  FROM part GROUP BY p_type, p_brand) WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Exact daily active users: COUNT DISTINCT per day WITHOUT a (day, user)
# exchange — bucket by user_id (a user's events co-locate), dedup
# (day, user) bucket-locally, then sum per-bucket distinct counts per
# day: users are unique across buckets, so bucket partials add exactly.
# ---------------------------------------------------------------------------

def events_daily_active_users(sf_dir: str, n_buckets: int | None = None):
    """Distinct users per UTC day, exact.  The exchange moves per-batch
    (bucket, day, user) dedup'd triples; the per-day final merge is a
    tiny integer groupby over ≤ days·P partial rows."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "events"))
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("int64").to_numpy()
        t = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "day_start": (us // 86_400_000_000) * 86_400})
        t = t.drop_duplicates()                     # per-batch combiner
        return t.assign(
            bucket=(t["user_id"].to_numpy() % n_b).astype(np.int32))

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["day_start", "user_id"])
        c = g.groupby("day_start", as_index=False).size()
        return pd.DataFrame({"day_start": c["day_start"].to_numpy(np.int64),
                             "n_active": c["size"].to_numpy(np.int64)})

    part = keyed.groupby("bucket").map_groups(fold, batch_format="pandas")
    return part.groupby("day_start").aggregate(
        Sum("n_active", alias_name="n_active"))


EVENTS_DAU_SQL = """
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
       count(DISTINCT user_id) AS n_active
FROM events GROUP BY day_start
"""


# ---------------------------------------------------------------------------
# Month-over-month revenue: aggregate the fact table to a BOUNDED month
# series (partial cents per batch), then apply the LAG on the series —
# the aggregate-then-window composite.  The series is ≤ months rows
# (bounded by calendar time, not data size), so finishing it locally is
# the scale-correct plan; the fact table is touched by exactly one
# combiner pass.
# ---------------------------------------------------------------------------

def orders_month_over_month(sf_dir: str):
    """Monthly order revenue with previous-month delta (absolute).  The
    delta is one IEEE subtraction of two exactly-reconstructed doubles —
    bit-equal to the oracle's window LAG.  First month is dropped
    (inner lag)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        per = df["o_orderdate"].dt.to_period("M")
        t = pd.DataFrame({
            "year": per.dt.year.to_numpy(np.int64),
            "month": per.dt.month.to_numpy(np.int64),
            "rev_c": _cents(df["o_totalprice"])})
        return t.groupby(["year", "month"], as_index=False).sum()

    series = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["year", "month"]).aggregate(Sum("rev_c", alias_name="rev_c")) \
        .to_pandas()                    # bounded: one row per month
    series = series.sort_values(["year", "month"], kind="mergesort")
    rev = series["rev_c"].to_numpy(np.int64) / 100.0
    out = pd.DataFrame({
        "year": series["year"].to_numpy(np.int64),
        "month": series["month"].to_numpy(np.int64),
        "revenue": rev,
        "mom_delta": np.r_[np.nan, rev[1:] - rev[:-1]]})
    return pa.Table.from_pandas(out.iloc[1:].reset_index(drop=True),
                                preserve_index=False)


ORDERS_MOM_SQL = """
WITH m AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         CAST(month(o_orderdate) AS BIGINT) AS month,
         sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS revenue
  FROM orders GROUP BY 1, 2)
SELECT year, month, revenue,
       revenue - lag(revenue) OVER (ORDER BY year, month) AS mom_delta
FROM m QUALIFY mom_delta IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Revenue share per brand: a grouped aggregate divided by the GLOBAL
# total — the window-total (sum() OVER ()) shape.  Both levels come out
# of the same single combiner pass; the global total is the exact-int
# sum of the bounded per-brand rows, so no second scan and no broadcast
# of anything but one scalar.
# ---------------------------------------------------------------------------

def part_revenue_share(sf_dir: str, n_buckets: int | None = None):
    """Share of lineitem revenue per part brand: brand revenue / total
    revenue.  part is a FACT at TPC-H scale (200k·SF rows), so the
    brand lookup is a bucketed join on partkey — lineitem ships
    per-batch (partkey, rev-partial) combiner rows, part ships
    (partkey, brand), the bucket fold joins and collapses to per-brand
    partials (≤ |brands| per bucket).  The share division is a single
    IEEE op on exact micros, mirrored by the oracle."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "part"))
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def key_li(df: pd.DataFrame) -> pd.DataFrame:
        rev = _micros(df["l_extendedprice"].to_numpy()
                      * (1.0 - df["l_discount"].to_numpy()))
        t = pd.DataFrame({"partkey": df["l_partkey"].to_numpy(),
                          "rev_u": rev})
        t = t.groupby("partkey", as_index=False).sum()
        return pd.DataFrame({
            "bucket": (t["partkey"].to_numpy() % n_b).astype(np.int32),
            "partkey": t["partkey"].to_numpy(np.int64),
            "rev_u": t["rev_u"].to_numpy(np.int64),
            "p_brand": np.full(len(t), "", dtype=object),
            "side": np.zeros(len(t), dtype=np.int8)})

    part_ds = rd.read_parquet(_t(sf_dir, "part"),
                              columns=["p_partkey", "p_brand"])

    def key_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (df["p_partkey"].to_numpy() % n_b).astype(np.int32),
            "partkey": df["p_partkey"].to_numpy(np.int64),
            "rev_u": np.zeros(len(df), dtype=np.int64),
            "p_brand": df["p_brand"].astype(object),
            "side": np.ones(len(df), dtype=np.int8)})

    both = ds.map_batches(key_li, batch_format="pandas",
                          batch_size=16384).union(
        part_ds.map_batches(key_part, batch_format="pandas"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["partkey", "rev_u"]]
        right = g[g["side"] == 1][["partkey", "p_brand"]]
        m = left.merge(right, on="partkey", how="inner")
        m = m.groupby("p_brand", as_index=False)["rev_u"].sum()
        return pd.DataFrame({"p_brand": m["p_brand"].astype(object),
                             "rev_u": m["rev_u"].to_numpy(np.int64)})

    agg = both.groupby("bucket").map_groups(fold, batch_format="pandas") \
        .groupby("p_brand").aggregate(Sum("rev_u", alias_name="rev_u")) \
        .to_pandas()                    # bounded: one row per brand
    total = int(agg["rev_u"].sum())
    return pa.table({
        "p_brand": pa.array(agg["p_brand"].tolist(), pa.string()),
        "revenue": pa.array(agg["rev_u"].to_numpy(np.int64) / 1_000_000.0),
        "share": pa.array(agg["rev_u"].to_numpy(np.int64) / float(total))})


PART_SHARE_SQL = """
WITH b AS (
  SELECT p_brand,
    sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
      AS rev_u
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY p_brand)
SELECT p_brand, rev_u / 1000000.0 AS revenue,
       rev_u / CAST((SELECT sum(rev_u) FROM b) AS DOUBLE) AS share
FROM b
"""


# ---------------------------------------------------------------------------
# Statistical outlier filter — the two-pass broadcast-aggregate-filter
# shape every ingest pipeline runs (drop/flag rows > mean + 3σ of their
# group).  Pass 1 folds exact integer moments (n, Σcents, Σcents²) per
# event_type: int64 per-batch partials (batch capped so Σcents² cannot
# overflow), Python-int combine — exact at any partial count.  The
# per-type threshold is ONE closed-form float expression over those
# exact ints, mirrored verbatim in the SQL oracle, so the float paths
# are bit-identical.  The threshold table (≤ |event_type| rows) is the
# only driver materialization; pass 2 re-reads and filters with the
# broadcast dict — no shuffle at all.
# ---------------------------------------------------------------------------

def events_outliers(sf_dir: str):
    """Events whose value exceeds mean + 3·stddev_pop of their
    event_type (exact-moment thresholds, IEEE-mirrored oracle)."""
    import math
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["value"])
        t = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "n": np.ones(len(df), dtype=np.int64),
                          "s": c, "sq": c * c})
        return t.groupby("event_type", as_index=False).sum()

    # cents² ≤ ~1e12 per row; 8192-row batches keep Σ ≤ ~1e16 (int64-safe)
    def fold(g: pd.DataFrame) -> pd.DataFrame:
        n = sum(int(v) for v in g["n"])
        s = sum(int(v) for v in g["s"])
        sq = sum(int(v) for v in g["sq"])
        mean = float(s) / n
        var = float(sq) / n - mean * mean
        thr = mean + 3.0 * math.sqrt(max(var, 0.0))
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "thr": [thr]})

    thr_df = ds.map_batches(partial, batch_format="pandas",
                            batch_size=8192) \
        .groupby("event_type").map_groups(fold, batch_format="pandas") \
        .to_pandas()                     # bounded: one row per event_type
    thr = dict(zip(thr_df["event_type"], thr_df["thr"]))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        t = df["event_type"].map(thr).to_numpy(np.float64)
        mask = _cents(df["value"]).astype(np.float64) > t
        out = df[mask]
        return pd.DataFrame({
            "event_id": out["event_id"].to_numpy(np.int64),
            "event_type": out["event_type"].astype(object),
            "value": out["value"].to_numpy(np.float64)})

    return ds.map_batches(keep, batch_format="pandas")


EVENTS_OUTLIERS_SQL = """
WITH m AS (
  SELECT event_type, count(*) AS n,
    sum(CAST(round(value*100) AS BIGINT)) AS s,
    sum(CAST(round(value*100) AS BIGINT)
        * CAST(round(value*100) AS BIGINT)) AS sq
  FROM events GROUP BY event_type),
t AS (
  SELECT event_type,
    CAST(s AS DOUBLE)/n + 3.0 * sqrt(greatest(
      CAST(sq AS DOUBLE)/n
        - (CAST(s AS DOUBLE)/n) * (CAST(s AS DOUBLE)/n), 0.0)) AS thr
  FROM m)
SELECT e.event_id, e.event_type, e.value
FROM events e JOIN t USING (event_type)
WHERE CAST(CAST(round(e.value*100) AS BIGINT) AS DOUBLE) > t.thr
"""


# ---------------------------------------------------------------------------
# Fuzzy string join (record linkage): for each part, how many OTHER
# parts have a name within Levenshtein distance 4, banding on the name's
# noun token (classic blocking key — candidates only form inside a
# band, so the quadratic is per-band, never global).  Inside a band the
# work contracts to UNIQUE names: the DP runs over |uniq|² pairs and
# per-row counts multiply back out — on vocab-generated names |uniq| is
# tiny regardless of row count.  At scale the banding key must bound
# band sizes (salt or secondary key if a band grows past memory); the
# DP is the standard unit-cost edit distance, bit-identical to the
# DuckDB ``levenshtein`` oracle.
# ---------------------------------------------------------------------------

def _levenshtein(a: str, b: str) -> int:
    # DuckDB's levenshtein counts UTF-8 BYTES, not codepoints
    # (hypothesis dialect-parity test) — ASCII inputs are unaffected
    a, b = a.encode("utf-8"), b.encode("utf-8")
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def part_fuzzy_match_counts(sf_dir: str, max_dist: int = 4):
    """Per-part count of distinct other parts whose p_name is within
    ``max_dist`` edits, banded by the name's second token."""
    ds = rd.read_parquet(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_name"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        names = df["p_name"].astype(str)
        band = [s.split(" ")[1] if len(s.split(" ")) > 1 else ""
                for s in names]
        return pd.DataFrame({"band": pd.array(band, dtype=object),
                             "p_partkey": df["p_partkey"]
                             .to_numpy(np.int64),
                             "p_name": names.to_numpy()})

    def fold(g: pd.DataFrame, _d=max_dist) -> pd.DataFrame:
        counts = g["p_name"].value_counts()
        uniq = list(counts.index)
        close = {u: [] for u in uniq}
        for i, u in enumerate(uniq):
            for v in uniq[i:]:
                if _levenshtein(u, v) <= _d:
                    close[u].append(v)
                    if u != v:
                        close[v].append(u)
        n_for = {u: sum(int(counts[w]) for w in close[u]) - 1
                 for u in uniq}          # -1: exclude the row itself
        n = g["p_name"].map(n_for).to_numpy(np.int64)
        keep = n > 0
        return pd.DataFrame({
            "p_partkey": g["p_partkey"].to_numpy(np.int64)[keep],
            "n_matches": n[keep]})

    return ds.map_batches(key, batch_format="pandas") \
        .groupby("band").map_groups(fold, batch_format="pandas")


PART_FUZZY_SQL = """
SELECT a.p_partkey, count(*) AS n_matches
FROM part a JOIN part b
  ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
 AND a.p_partkey <> b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
GROUP BY a.p_partkey
"""


# ---------------------------------------------------------------------------
# FULL OUTER JOIN — the one join type the engine had not yet exercised:
# per-user-day view counts ⟗ purchase counts (daily engagement vs
# conversion; days with views-but-no-purchase and purchase-but-no-view
# both survive with COALESCE'd zeros).  Both inputs are facts, so the
# join is the bucketed-exchange pattern keyed on user_id: per-batch
# (user, day, type) count combiners ride one shuffle; each bucket fold
# finishes its users' outer merge locally — no broadcast, no NULLs in
# the result schema.
# ---------------------------------------------------------------------------

def events_views_vs_purchases(sf_dir: str, n_buckets: int | None = None):
    """Per user and UTC day: n_views and n_purchases, keeping days where
    either side is absent (full outer semantics, zeros coalesced)."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "events"))
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("view", "purchase"))]
        us = df["ts"].astype("int64").to_numpy()
        t = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "day_start": (us // 86_400_000_000) * 86_400,
            "is_view": (df["event_type"].to_numpy() == "view")
            .astype(np.int64)})
        t["n"] = 1
        t = t.groupby(["user_id", "day_start", "is_view"],
                      as_index=False)["n"].sum()    # per-batch combiner
        t["bucket"] = (t["user_id"].to_numpy() % n_b).astype(np.int32)
        return t

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "day_start", "is_view"],
                      as_index=False)["n"].sum()
        v = g[g["is_view"] == 1][["user_id", "day_start", "n"]] \
            .rename(columns={"n": "n_views"})
        p = g[g["is_view"] == 0][["user_id", "day_start", "n"]] \
            .rename(columns={"n": "n_purchases"})
        m = v.merge(p, on=["user_id", "day_start"], how="outer")
        return pd.DataFrame({
            "user_id": m["user_id"].to_numpy(np.int64),
            "day_start": m["day_start"].to_numpy(np.int64),
            "n_views": m["n_views"].fillna(0).to_numpy(np.int64),
            "n_purchases": m["n_purchases"].fillna(0)
            .to_numpy(np.int64)})

    return keyed.groupby("bucket").map_groups(fold, batch_format="pandas")


EVENTS_VIEWS_PURCHASES_SQL = """
WITH b AS (
  SELECT user_id, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
         event_type
  FROM events WHERE event_type IN ('view', 'purchase')),
v AS (SELECT user_id, day_start, count(*) AS n_views
      FROM b WHERE event_type = 'view' GROUP BY 1, 2),
p AS (SELECT user_id, day_start, count(*) AS n_purchases
      FROM b WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT COALESCE(v.user_id, p.user_id) AS user_id,
       COALESCE(v.day_start, p.day_start) AS day_start,
       COALESCE(n_views, 0) AS n_views,
       COALESCE(n_purchases, 0) AS n_purchases
FROM v FULL OUTER JOIN p
  ON v.user_id = p.user_id AND v.day_start = p.day_start
"""


# ---------------------------------------------------------------------------
# Collect/string aggregation (array_agg / string_agg family): per
# nation, the sorted-distinct market segments of its customers as one
# deterministic comma-joined string.  The distinct (nation, segment)
# pair domain is bounded (25 × 5), so per-batch set-partials collapse
# the fact table before the exchange and the final join-and-sort runs
# on ≤125 rows — the scale shape for ANY collect-agg whose group-local
# distinct domain is bounded (collect over an unbounded domain needs
# the heavy-hitter/top-k treatment instead).
# ---------------------------------------------------------------------------

def nation_segments_agg(sf_dir: str):
    """Per nationkey: customer count and the ','-joined sorted distinct
    market segments (deterministic string_agg)."""
    ds = rd.read_parquet(_t(sf_dir, "customer"),
                         columns=["c_nationkey", "c_mktsegment"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "n_nationkey": df["c_nationkey"].to_numpy(np.int64),
            "c_mktsegment": df["c_mktsegment"].astype(object),
            "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby(["n_nationkey", "c_mktsegment"],
                         as_index=False)["n"].sum()

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["n_nationkey", "c_mktsegment"]).aggregate(
            Sum("n", alias_name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in df.groupby("n_nationkey"):
            segs = sorted(g["c_mktsegment"].astype(str))
            rows.append({"n_nationkey": int(k),
                         "segments": ",".join(segs),
                         "n_customers": int(g["n"].sum())})
        out = pd.DataFrame(rows)
        return pd.DataFrame({
            "n_nationkey": out["n_nationkey"].to_numpy(np.int64),
            "segments": out["segments"].astype(object),
            "n_customers": out["n_customers"].to_numpy(np.int64)})

    # ≤ 125 partial rows: one repartition(1) then a local finish is the
    # bounded-result endgame, not a scale concern
    return agg.repartition(1).map_batches(finish, batch_format="pandas")


NATION_SEGMENTS_SQL = """
SELECT c_nationkey AS n_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
         AS segments,
       count(*) AS n_customers
FROM customer GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Correlated-subquery decorrelation: orders priced above their own
# customer's average (``WHERE price > (SELECT avg(...) WHERE same
# cust)``).  Unlike events_outliers' per-TYPE thresholds (bounded →
# broadcast dict), the group key here is HIGH-cardinality (custkey), so
# the aggregate must REJOIN the fact instead of broadcasting: per-batch
# (custkey, n, Σcents) combiners and the fact rows ride ONE bucketed
# exchange on custkey; each bucket fold finishes its customers locally.
# The predicate is evaluated as ``cents·n > Σcents`` — pure int64, no
# division, so cross-engine equality is exact by construction.
# ---------------------------------------------------------------------------

def orders_above_customer_avg(sf_dir: str, n_buckets: int | None = None):
    """Orders with o_totalprice strictly above the average total price
    of the same customer's orders."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "orders"))
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey",
                                  "o_totalprice"])

    def rows_and_partials(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["o_totalprice"])
        facts = pd.DataFrame({
            "bucket": (df["o_custkey"].to_numpy() % n_b).astype(np.int32),
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "cents": c, "n": np.zeros(len(df), dtype=np.int64),
            "side": np.zeros(len(df), dtype=np.int8)})
        agg = pd.DataFrame({"o_custkey": df["o_custkey"].to_numpy(np.int64),
                            "cents": c,
                            "n": np.ones(len(df), dtype=np.int64)})
        agg = agg.groupby("o_custkey", as_index=False).sum()
        agg = pd.DataFrame({
            "bucket": (agg["o_custkey"].to_numpy() % n_b).astype(np.int32),
            "o_custkey": agg["o_custkey"].to_numpy(np.int64),
            "o_orderkey": np.zeros(len(agg), dtype=np.int64),
            "cents": agg["cents"].to_numpy(np.int64),
            "n": agg["n"].to_numpy(np.int64),
            "side": np.ones(len(agg), dtype=np.int8)})
        return pd.concat([facts, agg], ignore_index=True)

    keyed = ds.map_batches(rows_and_partials, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g[g["side"] == 1].groupby("o_custkey", as_index=False) \
            [["cents", "n"]].sum().rename(columns={"cents": "s"})
        f = g[g["side"] == 0][["o_custkey", "o_orderkey", "cents"]] \
            .merge(agg, on="o_custkey", how="inner")
        keep = f["cents"].to_numpy(np.int64) * f["n"].to_numpy(np.int64) \
            > f["s"].to_numpy(np.int64)
        f = f[keep]
        return pd.DataFrame({
            "o_orderkey": f["o_orderkey"].to_numpy(np.int64),
            "o_custkey": f["o_custkey"].to_numpy(np.int64),
            "o_totalprice": f["cents"].to_numpy(np.int64) / 100.0})

    return keyed.groupby("bucket").map_groups(fold, batch_format="pandas")


ORDERS_ABOVE_AVG_SQL = """
WITH a AS (
  SELECT o_custkey, count(*) AS n,
         sum(CAST(round(o_totalprice*100) AS BIGINT)) AS s
  FROM orders GROUP BY o_custkey)
SELECT o.o_orderkey, o.o_custkey,
       CAST(round(o.o_totalprice*100) AS BIGINT) / 100.0 AS o_totalprice
FROM orders o JOIN a USING (o_custkey)
WHERE CAST(round(o.o_totalprice*100) AS BIGINT) * a.n > a.s
"""


def lineitem_cube(sf_dir: str):
    """CUBE grouping sets over (l_returnflag, l_linestatus) — all four
    sets (detail, per-flag, per-status, grand total) emitted in the
    SAME one-scan plan as ``lineitem_rollup``: each batch writes into
    every set's partial (sentinel ``__ALL__`` marks collapsed dims, so
    the result is NULL-free), one small groupby merges.  The per-batch
    partial row count is bounded by the dims' value-domain product —
    the precondition for one-scan grouping sets at any corpus size."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_linestatus",
                                  "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = _micros(df["l_extendedprice"].to_numpy()
                      * (1.0 - df["l_discount"].to_numpy()))
        base = pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "l_linestatus": df["l_linestatus"].to_numpy(),
            "rev_u": rev, "n": np.ones(len(df), dtype=np.int64)})
        keys = ["l_returnflag", "l_linestatus"]
        detail = base.groupby(keys, as_index=False).sum()
        by_flag = detail.assign(l_linestatus=_ROLLUP_TOTAL) \
            .groupby(keys, as_index=False).sum()
        by_status = detail.assign(l_returnflag=_ROLLUP_TOTAL) \
            .groupby(keys, as_index=False).sum()
        total = by_flag.assign(l_returnflag=_ROLLUP_TOTAL) \
            .groupby(keys, as_index=False).sum()
        return pd.concat([detail, by_flag, by_status, total],
                         ignore_index=True)

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("rev_u", alias_name="rev_u"), Sum("n", alias_name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "n_items": df["n"],
            "revenue": df["rev_u"] / 1_000_000.0})

    return agg.map_batches(finish, batch_format="pandas")


LINEITEM_CUBE_SQL = """
SELECT coalesce(l_returnflag, '__ALL__') AS l_returnflag,
       coalesce(l_linestatus, '__ALL__') AS l_linestatus,
       count(*) AS n_items,
       sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
         / 1000000.0 AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# SQL set operations on DISTINCT key sets (INTERSECT / EXCEPT): parts
# shipped in both 1996 and 1997, and parts shipped in 1996 only.  One
# shared plan: per-batch DISTINCT (partkey, year-flag) pairs (the
# combiner — duplicates die before the exchange), one bucketed exchange
# on partkey, per-bucket set algebra on boolean masks.  The same fold
# serves any set op; only the final mask differs.
# ---------------------------------------------------------------------------

def _parts_year_setop(sf_dir: str, op: str, y_a: int = 1996,
                      y_b: int = 1997, n_buckets: int | None = None):
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "lineitem"))
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_shipdate"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        yr = df["l_shipdate"].dt.year.to_numpy()
        sel = (yr == y_a) | (yr == y_b)
        t = pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy(np.int64)
                          [sel],
                          "in_b": (yr[sel] == y_b)})
        t = t.drop_duplicates()               # per-batch combiner
        t["bucket"] = (t["l_partkey"].to_numpy() % n_b).astype(np.int32)
        return t

    keyed = ds.map_batches(key, batch_format="pandas")

    def fold(g: pd.DataFrame, _op=op) -> pd.DataFrame:
        p = g.groupby("l_partkey")["in_b"].agg(["min", "max"])
        in_a, in_b = ~p["min"].to_numpy(), p["max"].to_numpy()
        mask = (in_a & in_b) if _op == "intersect" else (in_a & ~in_b)
        return pd.DataFrame({"l_partkey":
                             p.index.to_numpy(np.int64)[mask]})

    return keyed.groupby("bucket").map_groups(fold, batch_format="pandas")


def parts_shipped_both_years(sf_dir: str):
    """DISTINCT partkeys shipped in both 1996 and 1997 (INTERSECT)."""
    return _parts_year_setop(sf_dir, "intersect")


def parts_shipped_1996_only(sf_dir: str):
    """DISTINCT partkeys shipped in 1996 but never in 1997 (EXCEPT)."""
    return _parts_year_setop(sf_dir, "except")


PARTS_INTERSECT_SQL = """
SELECT DISTINCT l_partkey FROM lineitem WHERE year(l_shipdate) = 1996
INTERSECT
SELECT DISTINCT l_partkey FROM lineitem WHERE year(l_shipdate) = 1997
"""

PARTS_EXCEPT_SQL = """
SELECT DISTINCT l_partkey FROM lineitem WHERE year(l_shipdate) = 1996
EXCEPT
SELECT DISTINCT l_partkey FROM lineitem WHERE year(l_shipdate) = 1997
"""


# ---------------------------------------------------------------------------
# percent_rank() OVER (PARTITION BY priority ORDER BY price) WITHOUT a
# global sort: the rank of a row is the cumulative count of strictly
# smaller values, which comes from the same bounded integer-cents
# histogram the exact-quantile ops use — per-batch (priority, cents)
# partials → one small groupby → per-priority cumsum → rank map
# broadcast once (bounded by the quantized price domain; for genuinely
# unbounded domains swap the broadcast for a bucketed join on cents) →
# fact rows map to ``rank_below / (N−1)`` in a second stateless pass.
# DuckDB defines percent_rank identically, so the single IEEE division
# of exact ints is bit-equal.
# ---------------------------------------------------------------------------

def orders_percent_rank(sf_dir: str):
    """Every order with its percent_rank of o_totalprice within its
    o_orderpriority."""
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_orderpriority",
                                  "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"pri": df["o_orderpriority"].to_numpy(),
                          "cents": _cents(df["o_totalprice"]),
                          "n": np.ones(len(df), dtype=np.int64)})
        return t.groupby(["pri", "cents"], as_index=False).sum()

    hist = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["pri", "cents"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()                  # bounded: quantized price domain
    rank_below: dict = {}
    n_tot: dict = {}
    for pri, g in hist.groupby("pri"):
        g = g.sort_values("cents")
        n = g["n"].to_numpy(np.int64)
        below = np.cumsum(n) - n
        rank_below[pri] = dict(zip(g["cents"].to_numpy(np.int64),
                                   below))
        n_tot[pri] = int(n.sum())
    rb_ref = ray.put(rank_below)
    nt_ref = ray.put(n_tot)

    def finish(df: pd.DataFrame, _rb=rb_ref, _nt=nt_ref) -> pd.DataFrame:
        rb, nt = ray.get(_rb), ray.get(_nt)
        pris = df["o_orderpriority"].to_numpy()
        cents = _cents(df["o_totalprice"])
        below = np.fromiter((rb[p][c] for p, c in zip(pris, cents)),
                            dtype=np.int64, count=len(df))
        denom = np.fromiter((nt[p] - 1 for p in pris),
                            dtype=np.int64, count=len(df))
        pr = np.where(denom > 0, below / np.maximum(denom, 1), 0.0)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_orderpriority": pris.astype(object),
            "pct_rank": pr})

    return ds.map_batches(finish, batch_format="pandas")


ORDERS_PCT_RANK_SQL = """
SELECT o_orderkey, o_orderpriority,
       percent_rank() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(round(o_totalprice*100)
                                          AS BIGINT)) AS pct_rank
FROM orders
"""


# ---------------------------------------------------------------------------
# Frequent co-occurring item pairs (market-basket): top-k part pairs
# bought together in the same order.  Group-then-rekey shape — pairs
# can only form once an order's lines are co-located, so the plan is
# TWO exchanges: (1) bucket by orderkey, fold forms within-order pairs
# and pre-counts them per bucket (the combiner: a pair's bucket-local
# count collapses before re-keying); (2) `coarse_topk_counts` re-keys
# by the pair itself for exact global counts + top-k.  Zero-padded
# pair strings make the merge's string tie-break equal to numeric
# (pa, pb) order, mirrored in the oracle's ORDER BY.
# ---------------------------------------------------------------------------

def part_pairs_topk(sf_dir: str, k: int = 20,
                    n_buckets: int | None = None):
    """Top-k (pa, pb, n) part pairs co-occurring within an order."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "lineitem"))
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        t = df.drop_duplicates()
        return pd.DataFrame({
            "bucket": (t["l_orderkey"].to_numpy() % n_b).astype(np.int32),
            "l_orderkey": t["l_orderkey"].to_numpy(np.int64),
            "l_partkey": t["l_partkey"].to_numpy(np.int64)})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for _, grp in g.drop_duplicates(["l_orderkey", "l_partkey"]) \
                .groupby("l_orderkey"):
            ps = np.sort(grp["l_partkey"].to_numpy(np.int64))
            for i in range(len(ps) - 1):
                for j in range(i + 1, len(ps)):
                    # 19 digits = full non-negative int64 range, so the
                    # string tie-break stays equal to numeric (pa, pb)
                    # order at any TPC-H scale factor (partkeys pass 1e9
                    # around sf5000)
                    kk = f"{ps[i]:019d}|{ps[j]:019d}"
                    out[kk] = out.get(kk, 0) + 1
        return pd.DataFrame({"pair": pd.array(list(out), dtype=object),
                             "n": np.fromiter(out.values(),
                                              dtype=np.int64,
                                              count=len(out))})

    partials = ds.map_batches(key, batch_format="pandas") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")
    top = coarse_topk_counts(partials, "pair", k, n_b)
    pa_ = top["pair"].str.slice(0, 19).astype(np.int64)
    pb_ = top["pair"].str.slice(20).astype(np.int64)
    return pd.DataFrame({"pa": pa_, "pb": pb_,
                         "n": top["n"].to_numpy(np.int64)})


PART_PAIRS_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT pa, pb, count(*) AS n FROM p GROUP BY pa, pb
ORDER BY n DESC, pa, pb LIMIT 20
"""


# ---------------------------------------------------------------------------
# Grouped least-squares regression (price vs quantity per returnflag) —
# the regr_slope/regr_intercept family, from the SAME exact integer
# moments as ``lineitem_corr``: int64 per-batch partials, Python-int
# combine, closed-form float finish mirrored verbatim in the oracle
# (the SQL recomputes from HUGEINT moments rather than calling
# regr_slope, whose streaming float accumulation is summation-order-
# dependent and would not be bit-equal).
# ---------------------------------------------------------------------------

def lineitem_regression(sf_dir: str):
    """Per-returnflag OLS fit of extendedprice (cents) on quantity:
    slope, intercept, n."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        y = _cents(df["l_extendedprice"])
        t = pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "n": np.ones(len(df), dtype=np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        return t.groupby("l_returnflag", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=8192)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        n = sum(int(v) for v in g["n"])
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxy = sum(int(v) for v in g["sxy"])
        sxx = sum(int(v) for v in g["sxx"])
        a = n * sxy - sx * sy
        b = n * sxx - sx * sx
        slope = float(a) / float(b)
        intercept = (float(sy) - slope * float(sx)) / n
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]],
                             "slope": [slope],
                             "intercept": [intercept],
                             "n": np.asarray([n], dtype=np.int64)})

    return partials.groupby("l_returnflag").map_groups(
        fold, batch_format="pandas")


LINEITEM_REGRESSION_SQL = """
WITH m AS (
  SELECT l_returnflag, count(*) AS n,
    sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
    sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS sy,
    sum(CAST(round(l_quantity) AS BIGINT)
        * CAST(round(l_extendedprice*100) AS BIGINT)) AS sxy,
    sum(CAST(round(l_quantity) AS BIGINT)
        * CAST(round(l_quantity) AS BIGINT)) AS sxx
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
  (CAST(sy AS DOUBLE)
   - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
     * CAST(sx AS DOUBLE)) / n AS intercept,
  n
FROM m
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 (large-volume orders): per-order HAVING gate on a fact-side
# aggregate, re-joined to two more facts, exact global top-k.  Two
# bucketed exchanges + a combiner top-k:
# 1. orderkey bucket: lineitem per-batch combiner partials + order rows
#    fold together — per-order quantity total, HAVING > threshold, order
#    columns attached in the same task (no separate join round).
# 2. custkey bucket: survivors ⋈ customer (a FACT at TPC-H scale —
#    bucketed, never broadcast) for c_name.
# 3. ``local_topk`` by (totalprice desc, orderdate, orderkey) — combiner
#    top-k, no total sort.
# ---------------------------------------------------------------------------

def q18_large_orders(sf_dir: str, qty_threshold: int = 250, k: int = 100):
    """Orders whose total lineitem quantity exceeds ``qty_threshold``:
    (c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty),
    top-k by (o_totalprice desc, o_orderdate, o_orderkey)."""
    n_b = buckets_for(table_bytes(sf_dir, "lineitem"))
    nb_c = buckets_for(table_bytes(sf_dir, "customer"))
    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name"])

    def li_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        okey = g["l_orderkey"].to_numpy(np.int64)
        n = len(g)
        return pd.DataFrame({
            "bucket": (okey % n_b).astype(np.int32),
            "okey": okey,
            "qty": np.rint(g["l_quantity"].to_numpy(np.float64))
            .astype(np.int64),
            "ckey": np.full(n, -1, dtype=np.int64),
            "price_c": np.zeros(n, dtype=np.int64),
            "odate": np.full(n, np.datetime64("1970-01-01", "us")),
            "side": np.zeros(n, dtype=np.int8)})

    def o_part(df: pd.DataFrame) -> pd.DataFrame:
        okey = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": (okey % n_b).astype(np.int32),
            "okey": okey,
            "qty": np.zeros(len(df), dtype=np.int64),
            "ckey": df["o_custkey"].to_numpy(np.int64),
            "price_c": _cents(df["o_totalprice"]),
            "odate": df["o_orderdate"].to_numpy(),
            "side": np.ones(len(df), dtype=np.int8)})

    both = li.map_batches(li_part, batch_format="pandas").union(
        orders.map_batches(o_part, batch_format="pandas"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        liq = g[g["side"] == 0].groupby("okey")["qty"].sum()
        big = liq[liq > qty_threshold]
        o = g[g["side"] == 1]
        keep, sum_qty = _int_join(o["okey"].to_numpy(np.int64),
                                  big.index.to_numpy(np.int64),
                                  big.to_numpy(np.int64))
        o = o[keep]
        return pd.DataFrame({
            "bucket2": (o["ckey"].to_numpy() % nb_c).astype(np.int32),
            "okey": o["okey"].to_numpy(np.int64),
            "ckey": o["ckey"].to_numpy(np.int64),
            "price_c": o["price_c"].to_numpy(np.int64),
            "odate": o["odate"].to_numpy(),
            "sum_qty": sum_qty,
            "side": np.zeros(len(o), dtype=np.int8),
            "c_name": np.full(len(o), "", dtype=object)})

    survivors = both.groupby("bucket").map_groups(fold,
                                                  batch_format="pandas")

    def c_part(df: pd.DataFrame) -> pd.DataFrame:
        ckey = df["c_custkey"].to_numpy(np.int64)
        n = len(df)
        return pd.DataFrame({
            "bucket2": (ckey % nb_c).astype(np.int32),
            "okey": np.full(n, -1, dtype=np.int64),
            "ckey": ckey,
            "price_c": np.zeros(n, dtype=np.int64),
            "odate": np.full(n, np.datetime64("1970-01-01", "us")),
            "sum_qty": np.zeros(n, dtype=np.int64),
            "side": np.ones(n, dtype=np.int8),
            "c_name": df["c_name"].astype(object)})

    both2 = survivors.union(cust.map_batches(c_part,
                                             batch_format="pandas"))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["side"] == 1]
        s = g[g["side"] == 0]
        # customer keys are unique and every survivor has one: the
        # searchsorted lookup carries the (string) name column too
        _hit, names = _int_join(s["ckey"].to_numpy(np.int64),
                                dim["ckey"].to_numpy(np.int64),
                                dim["c_name"].to_numpy())
        s = s[_hit]
        return pd.DataFrame({
            "c_name": names,
            "c_custkey": s["ckey"].to_numpy(np.int64),
            "o_orderkey": s["okey"].to_numpy(np.int64),
            "o_orderdate": s["odate"].to_numpy(),
            "price_c": s["price_c"].to_numpy(np.int64),
            "sum_qty": s["sum_qty"].to_numpy(np.int64)})

    rows = both2.groupby("bucket2").map_groups(attach,
                                               batch_format="pandas")
    top = local_topk(rows, ["price_c", "o_orderdate", "o_orderkey"],
                     [True, False, False], k).to_pandas()
    top["o_totalprice"] = top["price_c"].to_numpy(np.float64) / 100.0
    return top[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]]


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice,
       sum_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY round(o_totalprice * 100) DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q7 (volume shipping) generalized to ALL nation pairs: trade
# volume (supplier nation → customer nation) by ship year.  Q5's
# exchange-chain shape — THREE bucketed fact-fact joins (suppkey, then
# orderkey, then custkey), nations-only broadcast, per-bucket partials
# so the final groupby is ≤ 625·years·P rows.  (The classic two-nation
# filter is a parameter of the same plan; the all-pairs form keeps the
# operator meaningful at every sf tier.)
# ---------------------------------------------------------------------------

def q7_nation_volume(sf_dir: str, year_lo: int = 1995,
                     year_hi: int = 1996):
    """Revenue shipped from supplier nation to customer nation per ship
    year: (supp_nation, cust_nation, l_year, revenue)."""
    nat = pq.read_table(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"]).to_pylist()
    names = {r["n_nationkey"]: r["n_name"] for r in nat}
    nb_s = buckets_for(table_bytes(sf_dir, "supplier"))
    nb_o = buckets_for(table_bytes(sf_dir, "orders"))
    nb_c = buckets_for(table_bytes(sf_dir, "customer"))
    lo = pd.Timestamp(f"{year_lo}-01-01")
    hi = pd.Timestamp(f"{year_hi + 1}-01-01")

    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount",
                                  "l_shipdate"])

    # --- exchange 1: lineitem ⋈ supplier on suppkey (supplier = fact) ---
    def li_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        rev = np.rint(df["l_extendedprice"].to_numpy(np.float64)
                      * (1.0 - df["l_discount"].to_numpy(np.float64))
                      * 1_000_000).astype(np.int64)
        sk = df["l_suppkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": (sk % nb_s).astype(np.int32),
            "jkey": sk,
            "okey": df["l_orderkey"].to_numpy(np.int64),
            "year": df["l_shipdate"].dt.year.to_numpy(np.int32),
            "rev": rev,
            "nat": np.full(len(df), -1, dtype=np.int32),
            "side": np.zeros(len(df), dtype=np.int8)})

    def s_k(df: pd.DataFrame) -> pd.DataFrame:
        sk = df["s_suppkey"].to_numpy(np.int64)
        n = len(df)
        return pd.DataFrame({
            "bucket": (sk % nb_s).astype(np.int32),
            "jkey": sk,
            "okey": np.full(n, -1, dtype=np.int64),
            "year": np.zeros(n, dtype=np.int32),
            "rev": np.zeros(n, dtype=np.int64),
            "nat": df["s_nationkey"].to_numpy(np.int32),
            "side": np.ones(n, dtype=np.int8)})

    sup = rd.read_parquet(_t(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"])
    b1 = li.map_batches(li_k, batch_format="pandas").union(
        sup.map_batches(s_k, batch_format="pandas"))

    def j1(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["side"] == 1]
        c = g[g["side"] == 0]
        keep, snat = _int_join(c["jkey"].to_numpy(np.int64),
                               dim["jkey"].to_numpy(np.int64),
                               dim["nat"].to_numpy(np.int32))
        c = c[keep]
        # combiner: an order's lineitems collapse per (okey, snat, year)
        # before riding the next exchange (~4× fewer rows)
        t = pd.DataFrame({
            "okey": c["okey"].to_numpy(np.int64),
            "snat": snat,
            "year": c["year"].to_numpy(np.int32),
            "rev": c["rev"].to_numpy(np.int64)}) \
            .groupby(["okey", "snat", "year"], as_index=False)["rev"].sum()
        okey = t["okey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": (okey % nb_o).astype(np.int32),
            "jkey": okey,
            "snat": t["snat"].to_numpy(np.int32),
            "year": t["year"].to_numpy(np.int32),
            "rev": t["rev"].to_numpy(np.int64),
            "ckey": np.full(len(t), -1, dtype=np.int64),
            "side": np.zeros(len(t), dtype=np.int8)})

    matched1 = b1.groupby("bucket").map_groups(j1, batch_format="pandas")

    # --- exchange 2: ⋈ orders on orderkey → custkey ---
    def o_k(df: pd.DataFrame) -> pd.DataFrame:
        okey = df["o_orderkey"].to_numpy(np.int64)
        n = len(df)
        return pd.DataFrame({
            "bucket": (okey % nb_o).astype(np.int32),
            "jkey": okey,
            "snat": np.full(n, -1, dtype=np.int32),
            "year": np.zeros(n, dtype=np.int32),
            "rev": np.zeros(n, dtype=np.int64),
            "ckey": df["o_custkey"].to_numpy(np.int64),
            "side": np.ones(n, dtype=np.int8)})

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey"])
    b2 = matched1.union(orders.map_batches(o_k, batch_format="pandas"))

    def j2(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["side"] == 1]
        c = g[g["side"] == 0]
        keep, ck = _int_join(c["jkey"].to_numpy(np.int64),
                             dim["jkey"].to_numpy(np.int64),
                             dim["ckey"].to_numpy(np.int64))
        c = c[keep]
        # combiner: a customer's orders collapse per (ckey, snat, year)
        t = pd.DataFrame({
            "ckey": ck,
            "snat": c["snat"].to_numpy(np.int32),
            "year": c["year"].to_numpy(np.int32),
            "rev": c["rev"].to_numpy(np.int64)}) \
            .groupby(["ckey", "snat", "year"], as_index=False)["rev"].sum()
        ckey = t["ckey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": (ckey % nb_c).astype(np.int32),
            "jkey": ckey,
            "snat": t["snat"].to_numpy(np.int32),
            "year": t["year"].to_numpy(np.int32),
            "rev": t["rev"].to_numpy(np.int64),
            "cnat": np.full(len(t), -1, dtype=np.int32),
            "side": np.zeros(len(t), dtype=np.int8)})

    matched2 = b2.groupby("bucket").map_groups(j2, batch_format="pandas")

    # --- exchange 3: ⋈ customer on custkey, per-bucket partials ---
    def c_k(df: pd.DataFrame) -> pd.DataFrame:
        ckey = df["c_custkey"].to_numpy(np.int64)
        n = len(df)
        return pd.DataFrame({
            "bucket": (ckey % nb_c).astype(np.int32),
            "jkey": ckey,
            "snat": np.full(n, -1, dtype=np.int32),
            "year": np.zeros(n, dtype=np.int32),
            "rev": np.zeros(n, dtype=np.int64),
            "cnat": df["c_nationkey"].to_numpy(np.int32),
            "side": np.ones(n, dtype=np.int8)})

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])
    b3 = matched2.union(cust.map_batches(c_k, batch_format="pandas"))

    def j3(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["side"] == 1]
        c = g[g["side"] == 0]
        keep, cnat = _int_join(c["jkey"].to_numpy(np.int64),
                               dim["jkey"].to_numpy(np.int64),
                               dim["cnat"].to_numpy(np.int32))
        c = c[keep]
        part = pd.DataFrame({
            "snat": c["snat"].to_numpy(np.int32), "cnat": cnat,
            "year": c["year"].to_numpy(np.int32),
            "rev": c["rev"].to_numpy(np.int64)})
        return part.groupby(["snat", "cnat", "year"],
                            as_index=False)["rev"].sum()

    partials = b3.groupby("bucket").map_groups(j3, batch_format="pandas")
    # final merge driver-side: the partial set is bounded by construction
    # (≤ nations² · years · P rows), so a Ray sort exchange + per-group
    # overhead here buys nothing
    agg = partials.to_pandas() \
        .groupby(["snat", "cnat", "year"], as_index=False)["rev"].sum() \
        .sort_values(["snat", "cnat", "year"]).reset_index(drop=True)
    return pd.DataFrame({
        "supp_nation": agg["snat"].map(names).to_numpy(),
        "cust_nation": agg["cnat"].map(names).to_numpy(),
        "l_year": agg["year"].to_numpy(np.int32),
        "revenue": agg["rev"].to_numpy(np.float64) / 1_000_000.0})


Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT))
         / 1000000.0 AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Cohort retention (day-0 → day-7): the standard product-analytics
# self-join, as ONE bucketed exchange — a user's whole history lands in
# one bucket task (events_sessions' shape), where cohort date and the
# +7d membership test are a local set probe; the second groupby runs
# over per-bucket partials (≤ dates·P rows).
# ---------------------------------------------------------------------------

def events_retention_7d(sf_dir: str, n_buckets: int | None = None):
    """Per first-event date: cohort size and users active again exactly
    7 days later — (cohort_date, n_users, n_retained)."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "events"))
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": (uid % n_b).astype(np.int32),
            "user_id": uid,
            "day": df["ts"].dt.normalize().to_numpy()})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("user_id")["day"].agg(["min", lambda s: set(s)])
        per.columns = ["first", "days"]
        ret = np.fromiter(
            (f + np.timedelta64(7, "D") in d
             for f, d in zip(per["first"], per["days"])),
            dtype=np.int64, count=len(per))
        part = pd.DataFrame({
            "cohort_date": per["first"].to_numpy(),
            "n_users": np.ones(len(per), dtype=np.int64),
            "n_retained": ret})
        return part.groupby("cohort_date", as_index=False).sum()

    partials = ds.map_batches(key, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas")
    out = partials.groupby("cohort_date").aggregate(
        Sum("n_users", alias_name="n_users"),
        Sum("n_retained", alias_name="n_retained")).to_pandas()
    return out.sort_values("cohort_date").reset_index(drop=True)


EVENTS_RETENTION_SQL = """
WITH d AS (
  SELECT user_id, date_trunc('day', ts) AS day FROM events GROUP BY 1, 2),
f AS (
  SELECT user_id, min(day) AS cohort_date FROM d GROUP BY user_id),
r AS (
  SELECT f.user_id, f.cohort_date,
         max(CASE WHEN d.day = f.cohort_date + INTERVAL 7 DAY
             THEN 1 ELSE 0 END) AS retained
  FROM f JOIN d USING (user_id) GROUP BY f.user_id, f.cohort_date)
SELECT CAST(cohort_date AS TIMESTAMP) AS cohort_date,
       count(*) AS n_users,
       CAST(sum(retained) AS BIGINT) AS n_retained
FROM r GROUP BY cohort_date ORDER BY cohort_date
"""


# ---------------------------------------------------------------------------
# Cheapest-supplier-per-part (TPC-H Q2's argmin shape over observed
# lineitem prices — the testdata has no partsupp table): grouped argmin
# with deterministic tie-break, as per-batch combiner partials + one
# orderkey-free groupby over (part, supp, min_unit) partials.
# ---------------------------------------------------------------------------

def part_cheapest_supplier(sf_dir: str, n_buckets: int | None = None):
    """Per part: the supplier observed shipping it at the lowest unit
    price (cents, ties → smallest suppkey) — (l_partkey, l_suppkey,
    min_unit_cents)."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "lineitem"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # HALF-UP on both engines: np.rint is half-even but DuckDB
        # round() is half-away, and unit-price quotients DO land on
        # exact binary halves (e.g. 50.25/2*100) — floor(x+0.5) is the
        # same IEEE expression on both sides
        unit = np.floor(df["l_extendedprice"].to_numpy(np.float64)
                        / df["l_quantity"].to_numpy(np.float64)
                        * 100 + 0.5).astype(np.int64)
        t = pd.DataFrame({
            "pk": df["l_partkey"].to_numpy(np.int64),
            "sk": df["l_suppkey"].to_numpy(np.int64),
            "unit": unit})
        # batch-local argmin by (unit, suppkey)
        t = t.sort_values(["pk", "unit", "sk"],
                          kind="mergesort").drop_duplicates("pk")
        t["bucket"] = (t["pk"] % n_b).astype(np.int32)
        return t

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pk", "unit", "sk"],
                          kind="mergesort").drop_duplicates("pk")
        return pd.DataFrame({
            "l_partkey": g["pk"].to_numpy(np.int64),
            "l_suppkey": g["sk"].to_numpy(np.int64),
            "min_unit_cents": g["unit"].to_numpy(np.int64)})

    return rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice",
                 "l_quantity"]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas")


PART_CHEAPEST_SQL = """
WITH u AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)
           AS unit,
         l_suppkey
  FROM lineitem)
SELECT l_partkey, l_suppkey, unit AS min_unit_cents
FROM u
QUALIFY row_number() OVER (PARTITION BY l_partkey
                           ORDER BY unit, l_suppkey) = 1
"""


# ---------------------------------------------------------------------------
# LEFT OUTER join with zero-preserving aggregates: every customer with
# its order count and revenue — including customers with NO orders
# (the join-family member semi/anti/inner/full-outer didn't cover).
# One bucketed exchange on custkey: orders pre-combine per (custkey) in
# the batch map, customers carry identity rows, the bucket fold emits
# one row per customer with COALESCE-zero aggregates.
# ---------------------------------------------------------------------------

def customer_order_counts(sf_dir: str, n_buckets: int | None = None):
    """(c_custkey, c_mktsegment, n_orders, total_price) for EVERY
    customer — zero rows preserved."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "orders"))
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])

    def o_part(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"ckey": df["o_custkey"].to_numpy(np.int64),
                          "n": np.ones(len(df), dtype=np.int64),
                          "price_c": _cents(df["o_totalprice"])})
        g = t.groupby("ckey", as_index=False).sum()      # map-side combine
        return pd.DataFrame({
            "bucket": (g["ckey"].to_numpy() % n_b).astype(np.int32),
            "ckey": g["ckey"].to_numpy(np.int64),
            "n": g["n"].to_numpy(np.int64),
            "price_c": g["price_c"].to_numpy(np.int64),
            "seg": np.full(len(g), "", dtype=object),
            "side": np.zeros(len(g), dtype=np.int8)})

    def c_part(df: pd.DataFrame) -> pd.DataFrame:
        ckey = df["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": (ckey % n_b).astype(np.int32),
            "ckey": ckey,
            "n": np.zeros(len(df), dtype=np.int64),
            "price_c": np.zeros(len(df), dtype=np.int64),
            "seg": df["c_mktsegment"].astype(object),
            "side": np.ones(len(df), dtype=np.int8)})

    both = orders.map_batches(o_part, batch_format="pandas").union(
        cust.map_batches(c_part, batch_format="pandas"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0].groupby("ckey")[["n", "price_c"]].sum()
        c = g[g["side"] == 1]
        n = c["ckey"].map(o["n"]).fillna(0).astype(np.int64)
        p = c["ckey"].map(o["price_c"]).fillna(0).astype(np.int64)
        return pd.DataFrame({
            "c_custkey": c["ckey"].to_numpy(np.int64),
            "c_mktsegment": c["seg"].to_numpy(),
            "n_orders": n.to_numpy(),
            "total_price": p.to_numpy(np.float64) / 100.0})

    return both.groupby("bucket").map_groups(fold, batch_format="pandas")


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_custkey, c_mktsegment,
       CAST(coalesce(count(o_custkey), 0) AS BIGINT) AS n_orders,
       coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
         / 100.0 AS total_price
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
"""


# ---------------------------------------------------------------------------
# UNPIVOT (wide → long melt): the inverse of events_pivot_daily —
# numeric part attributes melt into (p_partkey, attr, value) rows.
# Stateless batch map (row expansion, no shuffle).
# ---------------------------------------------------------------------------

def part_attrs_unpivot(sf_dir: str):
    """Melt part's numeric attributes to long form: one row per
    (p_partkey, attr) with the value in cents/units as BIGINT."""
    ds = rd.read_parquet(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_size", "p_retailprice"])

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        pk = df["p_partkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "p_partkey": np.concatenate([pk, pk]),
            "attr": np.concatenate([
                np.full(n, "p_size", dtype=object),
                np.full(n, "p_retailprice_cents", dtype=object)]),
            "value": np.concatenate([
                df["p_size"].to_numpy(np.int64),
                _cents(df["p_retailprice"])])})

    return ds.map_batches(melt, batch_format="pandas")


PART_UNPIVOT_SQL = """
SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS BIGINT) AS value
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice_cents' AS attr,
       CAST(round(p_retailprice * 100) AS BIGINT) AS value
FROM part
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands: per customer, runs of CONSECUTIVE order days.  The
# classic sessionization-by-calendar shape (SQL: date − row_number()
# island key).  One bucketed exchange — a customer's full order-date
# history lands in one bucket task where islands are a vectorized diff.
# ---------------------------------------------------------------------------

def orders_date_islands(sf_dir: str, n_buckets: int | None = None):
    """Per customer: one row per island of consecutive order DAYS —
    (o_custkey, island_start, island_end, n_days)."""
    n_b = n_buckets or buckets_for(table_bytes(sf_dir, "orders"))
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        ck = df["o_custkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": (ck % n_b).astype(np.int32),
            "ckey": ck,
            "day": df["o_orderdate"].dt.normalize().to_numpy()})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["ckey", "day"]) \
            .sort_values(["ckey", "day"], kind="mergesort")
        ck = g["ckey"].to_numpy(np.int64)
        day = g["day"].to_numpy("datetime64[D]")
        n = len(g)
        if n == 0:
            return pd.DataFrame({
                "o_custkey": pd.Series([], dtype=np.int64),
                "island_start": pd.Series([], dtype="datetime64[us]"),
                "island_end": pd.Series([], dtype="datetime64[us]"),
                "n_days": pd.Series([], dtype=np.int64)})
        new_island = np.ones(n, dtype=bool)
        new_island[1:] = (ck[1:] != ck[:-1]) | \
            ((day[1:] - day[:-1]) != np.timedelta64(1, "D"))
        isl = np.cumsum(new_island) - 1
        starts = np.flatnonzero(new_island)
        ends = np.concatenate((starts[1:], [n])) - 1
        return pd.DataFrame({
            "o_custkey": ck[starts],
            "island_start": day[starts].astype("datetime64[us]"),
            "island_end": day[ends].astype("datetime64[us]"),
            "n_days": np.bincount(isl).astype(np.int64)})

    return ds.map_batches(key, batch_format="pandas") \
        .groupby("bucket").map_groups(fold, batch_format="pandas")


ORDERS_ISLANDS_SQL = """
WITH d AS (
  SELECT DISTINCT o_custkey, date_trunc('day', o_orderdate) AS day
  FROM orders),
r AS (
  SELECT o_custkey, day,
         day - INTERVAL (row_number() OVER (
             PARTITION BY o_custkey ORDER BY day)) DAY AS island_key
  FROM d)
SELECT o_custkey,
       CAST(min(day) AS TIMESTAMP) AS island_start,
       CAST(max(day) AS TIMESTAMP) AS island_end,
       count(*) AS n_days
FROM r GROUP BY o_custkey, island_key
"""
