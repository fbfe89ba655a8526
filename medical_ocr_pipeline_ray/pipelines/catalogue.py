"""Query catalogue: every public operator as a (callable, oracle-SQL) pair.

This is the single registry behind ``__ray_entry__.queries()`` /
``oracle_sql()`` (driver correctness gate) and the bench harness.  Each
callable takes ``sf_dir`` and returns a Dataset / DataFrame / Arrow table;
SQL-expressible operators carry a DuckDB oracle with IDENTICAL column
names and value semantics (see pipelines/relational.py design rules).

Operators without SQL entries (extraction, near-dup sketches, approximate
kNN, multimodal) are non-SQL-expressible; they are verified in the pytest
suite instead (oracle parity / planted-truth / recall tests).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ..config import DEFAULT_PIPELINE
from ..sources.transcripts import read_transcripts
from ..synth import tier_for_sf_dir
from . import (corpus, dedup, dedup_oracle, documents, multimodal, qa,
               relational, segments, similarity, textops, turn_oracle)
from .extract_pipeline import build_turns_pipeline
from ..stages.assemble import assemble_conversations


def sample_events(sf_dir: str):
    """Seeded random sample (10%) of the events stream — deterministic for
    a fixed seed; rows-only check (sampling is engine-specific)."""
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return ds.random_sample(0.1, seed=7)


def extract_turns(sf_dir: str):
    """Flagship per-turn extraction over the synthesized transcript corpus
    scaled to the sf tier (rows-only driver check; per-turn equality vs the
    single-process oracle is enforced in tests/test_ray_pipeline.py)."""
    ds = read_transcripts(tier_for_sf_dir(sf_dir))
    turns = build_turns_pipeline(ds)
    return turns.select_columns([
        "conv_id", "turn_idx", "role", "payload_class", "text_extracted",
        "blocks_kept", "blocks_dropped_dup", "content_chars"])


def assemble_convs(sf_dir: str):
    """Conversation assembly (salted groupby) over the extracted turns."""
    ds = read_transcripts(tier_for_sf_dir(sf_dir))
    turns = build_turns_pipeline(ds)
    convs = assemble_conversations(turns, DEFAULT_PIPELINE)
    return convs.select_columns(
        ["conv_id", "n_turns", "content_chars", "sha256"])


# ---------------------------------------------------------------------------
# Driver CORRECTNESS board rotation
# ---------------------------------------------------------------------------
# The driver's correctness gate checks only the FIRST 50 entries of
# ``queries()`` in insertion order.  To get every oracled operator a
# driver-green row within two rounds, ``queries()`` is ordered as
# ``_BOARD`` (the 50 slots for THIS round — all oracle-backed) followed by
# the remaining catalogue entries in their stable definition order.
#
# Rotation plan:
#   round 4: the 50 oracled queries that never received a driver row in
#     rounds 1-3 plus the newly-oracled turn-side / flagship queries —
#     CORRECTNESS_r04.json: 50/50 green.
#   round 5 (_BOARD below): the 29 oracled queries with no green driver
#     row in ANY of rounds 1-4 (computed from CORRECTNESS_r0{1..4}.json:
#     the qa_* family, the round-4 late adds q18/q7/retention/cheapest/
#     c4/cms/unpivot/islands, the rotation-deferred window ops, the
#     accuracy gates and the multimodal oracles), the round-5 new
#     oracles (dedup_pipeline_oracled + the sf-scaled flagship parity
#     rows), and the strongest prior greens as fill — preferring
#     operators whose code CHANGED this round (dedup_ngram_jaccard,
#     doc_containment, doc_token_cms_gate) so the driver re-verifies
#     them.  board(r4) ∪ board(r5) ∪ green(r1-r3) covers every oracled
#     query in the catalogue.
_BOARD: list[str] = [
    # --- oracled, never driver-green in r1-r4 (29) ---
    # turn-side QA family (exported-turns-view oracles)
    "qa_turn_metrics",
    "qa_content_accounting",
    "qa_against_expected",
    "topk_boilerplate_turns",
    "qa_quality_gate",
    "payload_coverage_digest",
    "assemble_documents_oracled",
    # round-4 late relational/text adds
    "q18_large_orders",
    "q7_nation_volume",
    "events_retention_7d",
    "part_cheapest_supplier",
    "customer_order_counts",
    "part_attrs_unpivot",
    "orders_date_islands",
    "doc_c4_line_filter",
    "doc_token_cms_gate",
    "approx_value_quantiles",
    # rotation-deferred window/analytics ops
    "supplier_topk_per_nation",
    "customer_ntile_by_nation",
    "events_pivot_daily",
    "doc_length_histogram",
    "part_mode_brand",
    "events_daily_active_users",
    "orders_month_over_month",
    # accuracy gates + containment + multimodal oracles
    "dedup_recall_gate",
    "doc_containment",
    "knn_recall_gate",
    "multimodal_resize",
    "multimodal_pixel_hist",
    # --- round-5 new oracles (every oracled query in the catalogue has
    # a driver row across rounds 1-5 once these go green) ---
    "dedup_pipeline_oracled",
    "extract_turns_sf_oracled",
    "assemble_conversations_sf_oracled",
    "multimodal_png_pixel_hist",
    "embedding_semantic_dedup",
    "knn_multi_query",
    "events_daily_users_hll",
    "conversation_corpus_pipeline",
    "knn_join_ivf",
    "conversation_decontaminate",
    # --- fill: strongest prior greens (flagship parity stays driver-
    # visible every round; dedup_ngram_jaccard re-verifies its round-5
    # prefix-filter blocking rework) ---
    "extract_turns_oracled",
    "assemble_conversations_oracled",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "corpus_build_pipeline",
    "q5_region_revenue",
    "q10_returned_revenue",
    "doc_quality_filter",
    "semi_join_customers_bloom",
    "segment_turns",
    "annotate_turn_entities",
]


# Queries whose callables IGNORE sf_dir and always run on a pinned synth
# tier (their SQL oracles are static strings over the exported oracle
# parquet, so the input must be sf-independent).  Bench timings under
# these names measure the pinned tier, NOT the sf-scaled corpus —
# bench.py surfaces any overlap with its timed subset via the
# ``pinned_tier_queries`` output field (round-4 ADVICE: the silent
# sf_dir no-op was easy to misread across rounds).
PINNED_TIER_QUERIES: frozenset[str] = frozenset({
    "qa_turn_metrics", "qa_content_accounting", "qa_against_expected",
    "topk_boilerplate_turns", "qa_quality_gate", "engine_block_stats",
    "best_variant_extraction", "segment_turns", "annotate_turn_entities",
    "payload_coverage_digest", "extract_turns_oracled",
    "assemble_conversations_oracled", "assemble_documents_oracled",
    "extract_turns_sf_oracled", "assemble_conversations_sf_oracled",
    "dedup_pipeline_oracled", "conversation_corpus_pipeline",
    "conversation_decontaminate",
})


def queries() -> dict[str, Callable[[str], Any]]:
    cat = _catalogue()
    board = [n for n in _BOARD if n in cat]
    rest = [n for n in cat if n not in set(board)]
    return {n: cat[n] for n in board + rest}


def _catalogue() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship extraction (SURVEY §2.2/§2.9/§2.7 core)
        "extract_turns": extract_turns,
        "assemble_conversations": assemble_convs,
        # relational / aggregation / window (SURVEY §2.4-§2.6)
        "q1_pricing_summary": relational.q1_pricing_summary,
        "filter_project_revenue": relational.filter_project_revenue,
        "join_orders_customer_segment": relational.join_orders_customer_segment,
        "join_customer_nation_balance": relational.join_customer_nation_balance,
        "topk_orders": relational.topk_orders,
        "distinct_brands": relational.distinct_brands,
        "events_hourly_window": relational.events_hourly_window,
        "events_sliding_window": relational.events_sliding_window,
        "events_sessions": relational.events_sessions,
        "events_asof_attribution": relational.events_asof_attribution,
        "lineitem_promo_revenue": relational.lineitem_promo_revenue,
        "label_counts": relational.label_counts,
        "join_lineitem_orders_priority":
            relational.join_lineitem_orders_priority,
        "semi_join_customers_with_orders":
            relational.semi_join_customers_with_orders,
        # bloom-prefiltered variant: same result, shuffle bytes pruned by
        # a mergeable 128 KiB bitmap of the fact side's keys
        "semi_join_customers_bloom": relational.semi_join_customers_bloom,
        "anti_join_customers_no_orders":
            relational.anti_join_customers_no_orders,
        "sample_events": sample_events,
        "events_json_props": relational.events_json_props,
        "doc_top_tokens": relational.doc_top_tokens,
        "q3_segment_revenue": relational.q3_segment_revenue,
        # windowed ranking (row_number analogue) + exact distinct
        "events_user_rank": relational.events_user_rank,
        "events_distinct_users_by_type":
            relational.events_distinct_users_by_type,
        # QA / stage metrics (SURVEY §2.5, §5)
        "qa_turn_metrics": qa.qa_turn_metrics,
        "qa_content_accounting": qa.qa_content_accounting,
        "qa_against_expected": qa.qa_against_expected,
        "topk_boilerplate_turns": qa.topk_boilerplate_turns,
        # per-engine comparison (G5), composite score + drop gate (G8/G10),
        # best-variant arbitration (O5)
        "engine_block_stats": qa.engine_block_stats,
        "qa_quality_gate": qa.qa_quality_gate,
        "best_variant_extraction": qa.best_variant_extraction,
        "payload_coverage_grid": qa.payload_coverage_grid,
        # segment assembly (SURVEY L5)
        "segment_turns": segments.segment_turns,
        # entity annotation (M10 analogue: span-tagged, text untouched)
        "annotate_turn_entities": segments.annotate_turn_entities,
        # schema-document assembly (reference stages 04/05 merge_dict fold;
        # nested struct / list-of-struct output)
        "assemble_documents": documents.assemble_documents,
        # text analysis (training-data ops)
        "doc_stats": textops.doc_stats,
        "doc_lang_id": textops.doc_lang_id,
        "doc_fingerprint": textops.doc_fingerprint,
        "events_value_quantiles": textops.events_value_quantiles,
        "events_value_quantiles_cont":
            textops.events_value_quantiles_cont,
        "approx_value_quantiles": textops.approx_value_quantiles,
        "events_value_mad": textops.events_value_mad,
        "doc_sample_k_per_source":
            textops.doc_sample_k_per_source,
        "events_value_quantiles_by_type":
            textops.events_value_quantiles_by_type,
        "approx_distinct_shingles": textops.approx_distinct_shingles,
        # windowed sketch: per-day HLL distinct users, tolerance-gated
        "events_daily_users_hll": textops.events_daily_users_hll,
        "doc_tfidf_top_terms": textops.doc_tfidf_top_terms,
        # span-offset analogue with a SQL oracle (entity spans over turns
        # cannot be oracled — the driver's DuckDB sees only the sf tables)
        "doc_term_first_pos": textops.doc_term_first_pos,
        # pre-training corpus gates: Gopher-style quality rules +
        # deterministic hash-stratified sampling (both exact-oracled)
        "doc_quality_filter": textops.doc_quality_filter,
        "doc_sample_stratified": textops.doc_sample_stratified,
        "doc_pii_scrub": textops.doc_pii_scrub,
        "doc_token_count": textops.doc_token_count,
        "doc_normalize_text": textops.doc_normalize_text,
        "events_outliers": relational.events_outliers,
        "part_fuzzy_match_counts": relational.part_fuzzy_match_counts,
        "events_views_vs_purchases": relational.events_views_vs_purchases,
        "nation_segments_agg": relational.nation_segments_agg,
        "orders_above_customer_avg":
            relational.orders_above_customer_avg,
        "lineitem_cube": relational.lineitem_cube,
        "orders_percent_rank": relational.orders_percent_rank,
        "part_pairs_topk": relational.part_pairs_topk,
        "lineitem_regression": relational.lineitem_regression,
        "parts_shipped_both_years":
            relational.parts_shipped_both_years,
        "parts_shipped_1996_only":
            relational.parts_shipped_1996_only,
        "doc_top_bigrams": textops.doc_top_bigrams,
        "annotate_doc_entities": textops.annotate_doc_entities,
        "doc_decontaminate": textops.doc_decontaminate,
        "doc_repetition_stats": textops.doc_repetition_stats,
        "embedding_label_centroids":
            similarity.embedding_label_centroids,
        # corpus-construction ops (segment dedup, chunking, LM scoring,
        # inverted index, URL harvest, sequence packing) — all exact,
        # all SQL-oracled (pipelines/corpus.py)
        "doc_segment_dedup": corpus.doc_segment_dedup,
        "doc_chunks": corpus.doc_chunks,
        "doc_unigram_commonness": corpus.doc_unigram_commonness,
        "bigram_postings": corpus.bigram_postings,
        "doc_domain_counts": corpus.doc_domain_counts,
        "doc_pack_bins": corpus.doc_pack_bins,
        "corpus_build_pipeline": corpus.corpus_build_pipeline,
        "doc_dup_spans": corpus.doc_dup_spans,
        "doc_vocab_oov": corpus.doc_vocab_oov,
        "q5_region_revenue": relational.q5_region_revenue,
        # round-4 additions (r5 board candidates): HAVING-gate rejoin
        # top-k, all-pairs trade-volume exchange chain, cohort
        # retention, grouped argmin, C4 line gate
        "q18_large_orders": relational.q18_large_orders,
        "q7_nation_volume": relational.q7_nation_volume,
        "events_retention_7d": relational.events_retention_7d,
        "part_cheapest_supplier": relational.part_cheapest_supplier,
        "customer_order_counts": relational.customer_order_counts,
        "part_attrs_unpivot": relational.part_attrs_unpivot,
        "orders_date_islands": relational.orders_date_islands,
        "doc_c4_line_filter": textops.doc_c4_line_filter,
        "doc_token_cms_gate": textops.doc_token_cms_gate,
        # flagship-as-oracled (pinned tier, sequential-oracle export):
        # a green row IS the per-turn / per-conversation parity claim
        "extract_turns_oracled": turn_oracle.extract_turns_oracled,
        # flagship parity at the driver's own correctness scale (t2)
        "extract_turns_sf_oracled": turn_oracle.extract_turns_sf_oracled,
        "assemble_conversations_sf_oracled":
            turn_oracle.assemble_conversations_sf_oracled,
        # capstone composite: extraction -> assembly -> gate -> dedup ->
        # packing as one plan, SQL-re-derived from the oracle export
        "conversation_corpus_pipeline":
            turn_oracle.conversation_corpus_pipeline,
        # SFT-side benchmark decontamination (held-out conv eval split)
        "conversation_decontaminate":
            turn_oracle.conversation_decontaminate,
        "payload_coverage_digest": qa.payload_coverage_digest,
        "assemble_conversations_oracled":
            turn_oracle.assemble_conversations_oracled,
        "assemble_documents_oracled":
            documents.assemble_documents_oracled,
        "events_gap_stats": relational.events_gap_stats,
        "events_funnel": relational.events_funnel,
        "supplier_topk_per_nation": relational.supplier_topk_per_nation,
        "orders_running_total": relational.orders_running_total,
        "events_lag_delta": relational.events_lag_delta,
        "customer_ntile_by_nation": relational.customer_ntile_by_nation,
        "events_pivot_daily": relational.events_pivot_daily,
        "lineitem_corr": relational.lineitem_corr,
        "q10_returned_revenue": relational.q10_returned_revenue,
        "doc_length_histogram": textops.doc_length_histogram,
        "doc_keep_best_per_source": corpus.doc_keep_best_per_source,
        "events_rolling_avg": relational.events_rolling_avg,
        "lineitem_rollup": relational.lineitem_rollup,
        "part_mode_brand": relational.part_mode_brand,
        "doc_heavy_hitters": textops.doc_heavy_hitters,
        "events_daily_active_users": relational.events_daily_active_users,
        "orders_month_over_month": relational.orders_month_over_month,
        "part_revenue_share": relational.part_revenue_share,
        # dedup family
        "dedup_exact": dedup.dedup_exact,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_simhash": dedup.dedup_simhash,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_pipeline": dedup.dedup_pipeline,
        # the composite vs the pinned-corpus sequential union-find oracle
        "dedup_pipeline_oracled": dedup_oracle.dedup_pipeline_oracled,
        # planted-twin recall of the sketch family as a driver gate
        "dedup_recall_gate": dedup.dedup_recall_gate,
        "doc_containment": dedup.doc_containment,
        # similarity search
        "knn_brute_force": similarity.knn_brute_force,
        # batched retrieval: Q queries, one corpus stream, combiner topk
        "knn_multi_query": similarity.knn_multi_query,
        # all-vectors neighbor graph via IVF cells, recall-gated
        "knn_join_ivf": similarity.knn_join_ivf,
        "knn_range_search": similarity.knn_range_search,
        "knn_label_predict": similarity.knn_label_predict,
        "knn_lsh": similarity.knn_lsh,
        "knn_ivf": similarity.knn_ivf,
        "knn_ivf_pruned": similarity.knn_ivf_pruned,
        # ANN accuracy as a driver row: brute-force exact top-k + per-
        # index recall@k gates (tolerance-gate pattern for retrieval)
        "knn_recall_gate": similarity.knn_recall_gate,
        "embedding_near_dup": similarity.embedding_near_dup,
        # SemDeDup: within-cluster cosine-duplicate collapse, exact-
        # oracled via recursive-CTE transitive closure
        "embedding_semantic_dedup": similarity.embedding_semantic_dedup,
        # multimodal plumbing (decode/feature/resize/frame-sample stages;
        # pixel kernels stubbed, Ray plumbing real)
        "multimodal_features": multimodal.multimodal_features,
        "multimodal_resize": multimodal.multimodal_resize,
        "multimodal_frame_sample": multimodal.multimodal_frame_sample,
        # decoded-PIXEL histogram with an ANALYTIC SQL oracle (the synth
        # pixel field is closed-form integer math): decode parity as a
        # driver row
        "multimodal_pixel_hist": multimodal.multimodal_pixel_hist,
        # PNG-only decode parity (in-sandbox inflate+unfilter kernel)
        "multimodal_png_pixel_hist": multimodal.multimodal_png_pixel_hist,
    }


def oracle_sql() -> dict[str, str]:
    # the turn-side oracles read the exported turns view via
    # read_parquet('<abs path>'); materialize it here (idempotent,
    # ~100 turns via the sequential python oracle) so the SQL works
    # regardless of whether the driver runs it before or after the Ray
    # queries
    from .dedup_oracle import ensure_export as ensure_dedup_export
    from .turn_oracle import ensure_export, ensure_scale_export
    ensure_export()
    ensure_scale_export()
    ensure_dedup_export()
    return {
        "annotate_turn_entities": segments._annotate_sql(),
        "segment_turns": segments._segment_sql(),
        "engine_block_stats": qa.engine_block_stats_sql(),
        "best_variant_extraction": qa.best_variant_sql(),
        "approx_distinct_shingles": textops.APPROX_DISTINCT_SQL,
        "events_daily_users_hll": textops.EVENTS_DAILY_HLL_SQL,
        "q1_pricing_summary": relational.Q1_SQL,
        "filter_project_revenue": relational.FILTER_PROJECT_SQL,
        "join_orders_customer_segment": relational.JOIN_SEGMENT_SQL,
        "join_customer_nation_balance": relational.JOIN_NATION_SQL,
        "topk_orders": relational.TOPK_SQL,
        "distinct_brands": relational.DISTINCT_SQL,
        "events_hourly_window": relational.EVENTS_WINDOW_SQL,
        "events_sliding_window": relational.EVENTS_SLIDING_SQL,
        "events_sessions": relational.EVENTS_SESSIONS_SQL,
        "events_asof_attribution": relational.EVENTS_ASOF_SQL,
        "lineitem_promo_revenue": relational.LINEITEM_PROMO_SQL,
        "label_counts": relational.LABEL_COUNTS_SQL,
        "join_lineitem_orders_priority": relational.JOIN_PRIORITY_SQL,
        "semi_join_customers_with_orders": relational.SEMI_JOIN_SQL,
        "semi_join_customers_bloom": relational.SEMI_JOIN_SQL,
        "anti_join_customers_no_orders": relational.ANTI_JOIN_SQL,
        "events_json_props": relational.EVENTS_JSON_SQL,
        "doc_top_tokens": relational.DOC_TOP_TOKENS_SQL,
        "q3_segment_revenue": relational.Q3_SQL,
        "doc_stats": textops.DOC_STATS_SQL,
        "doc_lang_id": textops.DOC_LANG_SQL,
        "doc_fingerprint": textops.DOC_FINGERPRINT_SQL,
        "events_value_quantiles": textops.EVENTS_QUANTILES_SQL,
        "events_value_quantiles_cont":
            textops.EVENTS_QUANTILES_CONT_SQL,
        "events_value_mad": textops.EVENTS_MAD_SQL,
        "doc_sample_k_per_source": textops.DOC_SAMPLE_K_SQL,
        "events_value_quantiles_by_type":
            textops.EVENTS_QUANTILES_BY_TYPE_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": dedup.DEDUP_NGRAM_SQL,
        "knn_brute_force": similarity.KNN_SQL,
        "knn_multi_query": similarity.KNN_MULTI_SQL,
        "knn_join_ivf": similarity.KNN_JOIN_IVF_SQL,
        "knn_range_search": similarity.KNN_RANGE_SQL,
        "knn_label_predict": similarity.KNN_LABEL_PREDICT_SQL,
        "doc_term_first_pos": textops.DOC_TERM_FIRST_POS_SQL,
        "doc_quality_filter": textops.DOC_QUALITY_SQL,
        "doc_sample_stratified": textops.DOC_SAMPLE_SQL,
        "doc_pii_scrub": textops.DOC_PII_SQL,
        "doc_token_count": textops.DOC_TOKEN_COUNT_SQL,
        "doc_normalize_text": textops.DOC_NORMALIZE_TEXT_SQL,
        "events_outliers": relational.EVENTS_OUTLIERS_SQL,
        "part_fuzzy_match_counts": relational.PART_FUZZY_SQL,
        "events_views_vs_purchases": relational.EVENTS_VIEWS_PURCHASES_SQL,
        "nation_segments_agg": relational.NATION_SEGMENTS_SQL,
        "orders_above_customer_avg":
            relational.ORDERS_ABOVE_AVG_SQL,
        "lineitem_cube": relational.LINEITEM_CUBE_SQL,
        "orders_percent_rank": relational.ORDERS_PCT_RANK_SQL,
        "part_pairs_topk": relational.PART_PAIRS_SQL,
        "lineitem_regression": relational.LINEITEM_REGRESSION_SQL,
        "parts_shipped_both_years": relational.PARTS_INTERSECT_SQL,
        "parts_shipped_1996_only": relational.PARTS_EXCEPT_SQL,
        "doc_top_bigrams": textops.DOC_TOP_BIGRAMS_SQL,
        "annotate_doc_entities": textops.ANNOTATE_DOC_ENTITIES_SQL,
        "doc_decontaminate": textops.DOC_DECONTAMINATE_SQL,
        "doc_repetition_stats": textops.DOC_REPETITION_SQL,
        "embedding_label_centroids": similarity.LABEL_CENTROIDS_SQL,
        "doc_segment_dedup": corpus.DOC_SEGMENT_DEDUP_SQL,
        "doc_chunks": corpus.DOC_CHUNKS_SQL,
        "doc_unigram_commonness": corpus.DOC_UNIGRAM_SQL,
        "bigram_postings": corpus.BIGRAM_POSTINGS_SQL,
        "doc_domain_counts": corpus.DOC_DOMAIN_SQL,
        "doc_pack_bins": corpus.DOC_PACK_SQL,
        "corpus_build_pipeline": corpus.CORPUS_BUILD_SQL,
        "doc_dup_spans": corpus.DOC_DUP_SPANS_SQL,
        "doc_vocab_oov": corpus.DOC_VOCAB_OOV_SQL,
        "q5_region_revenue": relational.Q5_SQL,
        "q18_large_orders": relational.Q18_SQL,
        "q7_nation_volume": relational.Q7_SQL,
        "events_retention_7d": relational.EVENTS_RETENTION_SQL,
        "part_cheapest_supplier": relational.PART_CHEAPEST_SQL,
        "customer_order_counts": relational.CUSTOMER_ORDER_COUNTS_SQL,
        "part_attrs_unpivot": relational.PART_UNPIVOT_SQL,
        "orders_date_islands": relational.ORDERS_ISLANDS_SQL,
        "doc_c4_line_filter": textops.DOC_C4_LINE_SQL,
        "doc_token_cms_gate": textops.DOC_TOKEN_CMS_SQL,
        "extract_turns_oracled": turn_oracle.extract_turns_sql(),
        "extract_turns_sf_oracled": turn_oracle.extract_turns_sf_sql(),
        "assemble_conversations_sf_oracled":
            turn_oracle.assemble_conversations_sf_sql(),
        "conversation_corpus_pipeline":
            turn_oracle.conversation_corpus_sql(),
        "conversation_decontaminate":
            turn_oracle.conversation_decontaminate_sql(),
        "assemble_conversations_oracled":
            turn_oracle.assemble_conversations_sql(),
        "qa_turn_metrics": qa.qa_turn_metrics_sql(),
        "qa_quality_gate": qa.qa_quality_gate_sql(),
        "qa_against_expected": qa.qa_against_expected_sql(),
        "payload_coverage_digest": qa.payload_coverage_digest_sql(),
        "multimodal_pixel_hist": multimodal.MULTIMODAL_PIXEL_SQL,
        "multimodal_png_pixel_hist": multimodal.MULTIMODAL_PNG_PIXEL_SQL,
        "multimodal_resize": multimodal.MULTIMODAL_RESIZE_SQL,
        "assemble_documents_oracled": documents.assemble_documents_sql(),
        "knn_recall_gate": similarity.KNN_RECALL_GATE_SQL,
        "embedding_semantic_dedup": similarity.SEMANTIC_DEDUP_SQL,
        "dedup_recall_gate": dedup.DEDUP_RECALL_GATE_SQL,
        "dedup_pipeline_oracled": dedup_oracle.dedup_pipeline_sql(),
        "doc_containment": dedup.DOC_CONTAINMENT_SQL,
        "qa_content_accounting": qa.qa_content_accounting_sql(),
        "topk_boilerplate_turns": qa.topk_boilerplate_sql(),
        "approx_value_quantiles": textops.APPROX_QUANTILES_SQL,
        "events_gap_stats": relational.EVENTS_GAP_SQL,
        "events_funnel": relational.EVENTS_FUNNEL_SQL,
        "supplier_topk_per_nation": relational.SUPPLIER_TOPK_SQL,
        "orders_running_total": relational.ORDERS_RUNNING_SQL,
        "events_lag_delta": relational.EVENTS_LAG_DELTA_SQL,
        "customer_ntile_by_nation": relational.CUSTOMER_NTILE_SQL,
        "events_pivot_daily": relational.EVENTS_PIVOT_SQL,
        "lineitem_corr": relational.LINEITEM_CORR_SQL,
        "q10_returned_revenue": relational.Q10_SQL,
        "doc_length_histogram": textops.DOC_LENGTH_HIST_SQL,
        "doc_keep_best_per_source": corpus.DOC_KEEP_BEST_SQL,
        "events_rolling_avg": relational.EVENTS_ROLLING_SQL,
        "lineitem_rollup": relational.LINEITEM_ROLLUP_SQL,
        "part_mode_brand": relational.PART_MODE_SQL,
        "doc_heavy_hitters": textops.DOC_HEAVY_HITTERS_SQL,
        "events_daily_active_users": relational.EVENTS_DAU_SQL,
        "orders_month_over_month": relational.ORDERS_MOM_SQL,
        "part_revenue_share": relational.PART_SHARE_SQL,
        "events_user_rank": relational.EVENTS_USER_RANK_SQL,
        "events_distinct_users_by_type":
            relational.EVENTS_DISTINCT_USERS_SQL,
    }
