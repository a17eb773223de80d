"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``declarativeml_spark``; this module just
re-exports the query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from declarativeml_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# Queries with the least accumulated verification evidence go first:
# correctness tooling that samples a prefix of this dict should spend
# its budget on rows not yet (or not yet successfully) checked, not on
# re-confirming long-green ones.
# Priority for a ~50-row sampling window, in order:
# 1. The TPC-H classics + two round-1 stragglers (18): never had ANY
#    driver row across rounds 1-2 (round-1 cap cut them, round 2's
#    run aborted) — the shapes a real user hits constantly.
# 2. Red in round 1, fixed since (10): the fixes need driver
#    confirmation, not just the local mirror gate.
# 3. Rewritten since their green round-1 rows (3): candidate-gated
#    pair generation replaced the blocked forms.
# 4. This round's new operators (~17, grows as the round adds more).
# 5. Round-2/3 additions that were locally green both rounds but have
#    no driver row yet (the remainder) — they take whatever window is
#    left and rotate forward next round.
_CHECK_FIRST = (
    # (1) TPC-H classics, never driver-checked
    "q6_discount_revenue",
    "q8_nation_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_brand_quantity_revenue",
    "q20_heavy_shippers",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "revenue_moving_avg_7d",
    "embedding_array_stats",
    # (2) red in round 1, fixed since — need fresh rows
    "events_sessionize",
    "events_hourly_stats",
    "events_json_extract",
    "events_type_hour_cube",
    "asof_last_view_before_purchase",
    "events_value_range_join",
    "part_type_shares",
    "text_winnow_fingerprints",
    "approx_distinct_parts",
    "multimodal_byte_histogram",
    # (3) rewritten since round 1 (candidate-gated pair generation) —
    # the green round-1 rows no longer vouch for them
    "embedding_similarity_pairs",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    # (4) round-3 new batch — never driver-checked
    "dedup_substring_runs",
    "lakehouse_compaction_plan",
    "events_hourly_corr",
    "events_top_paths",
    "embedding_pca_power",
    "orders_categorical_profile",
    "lineitem_winsorized_stats",
    "customer_rfm_segments",
    "events_transition_matrix",
    "corpus_dedup_survivorship",
    "text_ngram_novelty",
    "events_time_weighted_value",
    "orders_seasonality_index",
    "nation_revenue_trend",
    "referential_integrity_audit",
    "part_abc_classification",
    "part_pair_affinity",
    "events_new_users_cumulative",
    "orders_benford_audit",
    "key_uniqueness_audit",
    "lineitem_price_ols",
    "nb_lang_confusion",
    "lineitem_decision_stump",
    "lineitem_feature_mi",
    "segment_spend_ttest",
    "events_change_points",
    "nation_revenue_gini",
    "events_autocorrelation",
    "cluster_top_terms",
    "retention_half_life",
    "orders_forecast_backtest",
    "events_fano_factor",
    "parttype_supplier_hhi",
    "text_zipf_fit",
    "events_transition_entropy",
    "orders_calendar_completeness",
    "corpus_shard_assignment",
    "tokenizer_fertility",
    "embedding_centroid_dispersion",
    "corpus_temperature_mix",
    "events_rate_anomalies",
    "decontam_bloom_gate",
    "token_heavy_hitters_cms",
    "lineitem_numeric_profile",
    "embedding_pq_codes",
    "text_tfidf_top_terms",
    "quality_source_percentile",
    "source_length_drift_psi",
    "ann_ivf_recall",
    "orders_merge_upsert",
    "events_latest_per_user",
    "multimodal_audio_energy",
    "events_rollup_incremental",
    "lineitem_zorder_layout",
    "token_bigram_pmi",
    "lang_id_confusion",
    "knn_graph_triangles",
    # (5) round-2/3 additions, locally green since introduction,
    # no driver row yet — rotate forward next round
    "text_heuristic_filters",
    "knn_graph_degrees",
    "events_user_sessions",
    "embedding_quantize_int8",
    "token_vocab_coverage",
    "dedup_incremental_delta",
    "events_minute_gapfill",
    "multimodal_frame_sample",
    "text_pii_redaction",
    "semdedup_embedding_prune",
    "corpus_cross_source_overlap",
    "events_conversion_funnel",
    "events_weekly_retention",
    "text_chunk_windows",
    "text_unigram_surprisal",
    "corpus_source_datasheet",
    "decontam_benchmark_overlap",
    "pack_concat_chunks",
    "text_quality_repetition",
    "text_bm25_topk",
    "corpus_stratified_quota",
    "corpus_weighted_sample",
    "nation_trade_pagerank",
    "hybrid_search_rrf",
    "join_key_hotspots",
    "pipeline_pretraining_corpus",
)


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _CHECK_FIRST if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return _ordered(dict(ORACLES))
