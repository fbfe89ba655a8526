"""Local replica of the driver's correctness gate: every SQL-oracled query
run at sf0.001 and compared (rows + schema + exact values) against DuckDB.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
    import ray.data as rd
    import pyarrow as pa
    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame):
    assert len(ray_df) == len(sql_df), \
        f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns), \
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.array_equal(av.astype(np.float64), bv.astype(np.float64))
        else:
            ok = (av == bv).all()
        assert ok, f"{name}: column {col} mismatch\n{a[col].head()}\n" \
                   f"{b[col].head()}"


@pytest.mark.parametrize("name", [
    "q1_pricing_summary", "filter_project_revenue",
    "join_orders_customer_segment", "join_customer_nation_balance",
    "topk_orders", "distinct_brands", "events_hourly_window",
    "events_sessions", "label_counts", "doc_stats", "doc_lang_id",
    "doc_fingerprint", "dedup_exact", "knn_brute_force",
    "join_lineitem_orders_priority", "semi_join_customers_with_orders",
    "anti_join_customers_no_orders", "events_json_props", "doc_top_tokens",
    "q3_segment_revenue", "events_sliding_window",
    "events_asof_attribution", "lineitem_promo_revenue",
    "events_value_quantiles", "events_value_quantiles_by_type",
    "events_value_quantiles_cont", "events_value_mad",
    "doc_sample_k_per_source",
    "dedup_ngram_jaccard", "doc_term_first_pos", "events_user_rank",
    "events_distinct_users_by_type", "knn_range_search",
    "doc_quality_filter", "doc_sample_stratified",
    "semi_join_customers_bloom", "doc_pii_scrub",
    "doc_token_count", "doc_top_bigrams", "annotate_doc_entities",
    "doc_decontaminate", "embedding_label_centroids",
    "doc_repetition_stats", "knn_label_predict",
    "doc_segment_dedup", "doc_chunks", "doc_unigram_commonness",
    "bigram_postings", "doc_domain_counts", "doc_pack_bins",
    "doc_dup_spans", "doc_vocab_oov", "q5_region_revenue",
    "events_gap_stats", "events_funnel", "supplier_topk_per_nation",
    "orders_running_total", "events_lag_delta", "customer_ntile_by_nation",
    "events_pivot_daily", "lineitem_corr", "q10_returned_revenue",
    "doc_length_histogram", "doc_keep_best_per_source",
    "events_rolling_avg", "lineitem_rollup", "part_mode_brand",
    "doc_heavy_hitters", "events_daily_active_users",
    "orders_month_over_month", "part_revenue_share",
    "doc_normalize_text", "events_outliers",
    "part_fuzzy_match_counts", "events_views_vs_purchases",
    "nation_segments_agg", "orders_above_customer_avg",
    "lineitem_cube", "parts_shipped_both_years",
    "orders_percent_rank", "part_pairs_topk",
    "lineitem_regression",
    "corpus_build_pipeline",
    "parts_shipped_1996_only",
    "annotate_turn_entities", "segment_turns", "engine_block_stats",
    "best_variant_extraction", "approx_distinct_shingles",
    "q18_large_orders", "q7_nation_volume", "events_retention_7d",
    "part_cheapest_supplier", "doc_c4_line_filter",
    "extract_turns_oracled", "assemble_conversations_oracled",
    "qa_turn_metrics", "qa_content_accounting",
    "topk_boilerplate_turns", "approx_value_quantiles",
    "qa_quality_gate", "qa_against_expected", "payload_coverage_digest",
    "multimodal_pixel_hist", "customer_order_counts",
    "multimodal_resize", "assemble_documents_oracled",
    "knn_recall_gate", "dedup_recall_gate",
    "part_attrs_unpivot", "orders_date_islands",
    "doc_token_cms_gate", "doc_containment",
    "dedup_pipeline_oracled",
    "extract_turns_sf_oracled", "assemble_conversations_sf_oracled",
    "multimodal_png_pixel_hist", "embedding_semantic_dedup",
    "knn_multi_query", "events_daily_users_hll",
    "conversation_corpus_pipeline", "knn_join_ivf",
    "conversation_decontaminate",
])
def test_query_matches_duckdb(ray_session, con, name):
    from medical_ocr_pipeline_ray.pipelines.catalogue import oracle_sql, queries
    q = queries()[name]
    sql = oracle_sql()[name]
    ray_df = _to_df(q(SF_DIR))
    sql_df = con.execute(sql).fetchdf()
    _compare(name, ray_df, sql_df)


def test_all_queries_have_oracle_or_are_listed(ray_session):
    """Every query is either SQL-oracled or a documented non-SQL op."""
    from medical_ocr_pipeline_ray.pipelines.catalogue import oracle_sql, queries
    non_sql = {"extract_turns", "assemble_conversations",
               "assemble_documents", "dedup_minhash_lsh",
               "dedup_simhash", "dedup_clusters", "dedup_pipeline",
               "knn_lsh", "knn_ivf", "knn_ivf_pruned",
               "embedding_near_dup", "multimodal_features",
               "multimodal_frame_sample",
               "sample_events", "payload_coverage_grid",
               "doc_tfidf_top_terms"}
    assert set(queries()) == set(oracle_sql()) | non_sql


def test_entry_contract(ray_session):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ds = mod.entry()
    df = _to_df(ds)
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "text_extracted"} <= set(df.columns)


def test_rolling_avg_range_peers_semantics(ray_session, tmp_path):
    """RANGE BETWEEN ... CURRENT ROW includes ts-PEERS: rows of the same
    user with identical ts must all be inside each other's window.
    Constructed ties (absent from the synth tables) vs DuckDB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_ocr_pipeline_ray.pipelines.relational import (
        EVENTS_ROLLING_SQL, events_rolling_avg)
    base = 1_700_000_000_000_000
    rows = {
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": pa.array([base, base, base + 10_000_000,
                        base + 3_600_000_000, base + 3_600_000_000,
                        base + 9_000_000_000], pa.timestamp("us")),
        "user_id": [7, 7, 7, 7, 7, 8],
        "event_type": ["view"] * 6,
        "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
        "props": ["{}"] * 6,
    }
    pq.write_table(pa.table(rows), str(tmp_path / "events.parquet"))
    got = events_rolling_avg(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(EVENTS_ROLLING_SQL).fetchdf()
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert (got["n_in_window"].to_numpy()
            == want["n_in_window"].to_numpy()).all()
    assert (got["avg_value"].to_numpy()
            == want["avg_value"].to_numpy()).all()
    # the tie rows (events 1,2) see BOTH peers: n = 2
    assert set(got.loc[got["event_id"].isin([1, 2]), "n_in_window"]) == {2}


def test_doc_normalize_text_messy_inputs(ray_session, tmp_path):
    """The synth corpus has no whitespace runs, so normalization is a
    no-op there; constructed messy docs (NFD accents, ligatures, tab/
    newline runs, padding) exercise the real path vs DuckDB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_ocr_pipeline_ray.pipelines.textops import (
        DOC_NORMALIZE_TEXT_SQL, doc_normalize_text)
    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": ["Café  au\t\tlait \n\n x ",   # NFD -> NFC + runs
                 "ﬁne  ＡＢ ",           # ligature + fullwidth
                 "  leading and trailing  ",
                 "already clean"],
        "label": ["a"] * 4, "source": ["s"] * 4,
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    got = doc_normalize_text(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(DOC_NORMALIZE_TEXT_SQL).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    _compare("doc_normalize_text_messy", got, want)
    assert got.loc[0, "norm_text"] == "Café au lait x"
    assert (got["n_chars_after"] < got["n_chars_before"]).sum() == 3


def test_events_outliers_degenerate_variance(ray_session, tmp_path):
    """All-equal values within a type → variance 0 → no rows pass the
    strict > threshold; a single extreme row in another type passes.
    Constructed inputs vs DuckDB (guards the greatest(var,0) and the
    strict-inequality edge)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_ocr_pipeline_ray.pipelines.relational import (
        EVENTS_OUTLIERS_SQL, events_outliers)
    base = 1_700_000_000_000_000
    n = 41                      # enough samples that a lone spike can
    rows = {                    # exceed 3 sigma (max z grows with n)
        "event_id": list(range(1, n + 1)),
        "ts": pa.array([base + i for i in range(n)], pa.timestamp("us")),
        "user_id": [1] * n,
        "event_type": ["flat"] * 20 + ["spiky"] * 21,
        "value": [5.0] * 20 + [1.0] * 20 + [1000.0],
        "props": ["{}"] * n,
    }
    pq.write_table(pa.table(rows), str(tmp_path / "events.parquet"))
    got = events_outliers(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(EVENTS_OUTLIERS_SQL).fetchdf() \
        .sort_values("event_id").reset_index(drop=True)
    _compare("events_outliers_degenerate", got, want)
    assert list(got["event_id"]) == [41]     # only the spike survives


def test_customer_order_counts_preserves_zero_order_customers(
        ray_session, tmp_path):
    """The sf corpora happen to give every customer at least one order,
    so the LEFT-join zero path needs an explicit fixture: a customer
    with no orders must surface with n_orders = 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from medical_ocr_pipeline_ray.pipelines.relational import (
        CUSTOMER_ORDER_COUNTS_SQL, customer_order_counts)

    d = str(tmp_path)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": pa.array(["A", "B", "A"])}),
        f"{d}/customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        "o_totalprice": pa.array([10.50, 4.25, 7.00])}),
        f"{d}/orders.parquet")
    got = customer_order_counts(d, n_buckets=4).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)
    assert got["n_orders"].tolist() == [2, 0, 1]
    assert got["total_price"].tolist() == [14.75, 0.0, 7.0]
    c = duckdb.connect()
    for t in ("customer", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{d}/{t}.parquet')")
    want = c.execute(CUSTOMER_ORDER_COUNTS_SQL).df() \
        .sort_values("c_custkey").reset_index(drop=True)
    _compare("customer_order_counts_zero", got, want)


def test_correctness_board_first_50_all_oracled(ray_session):
    """The driver's correctness gate checks only the first 50 queries()
    entries — a catalogue edit must never push a no-oracle entry into
    those slots (the exact round-3 regression: reordering silently
    dropped 11 checked queries off the board)."""
    from medical_ocr_pipeline_ray.pipelines.catalogue import (_BOARD,
                                                              oracle_sql,
                                                              queries)
    names = list(queries())
    sql = oracle_sql()
    assert len(names) >= 50
    missing = [n for n in names[:50] if n not in sql]
    assert not missing, f"no-oracle entries occupy board slots: {missing}"
    # the declared board IS the first 50, in order
    assert names[:len(_BOARD)] == [n for n in _BOARD if n in set(names)]
