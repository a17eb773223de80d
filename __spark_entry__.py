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
# Round-10 rotation (scripts/rotation.py over CORRECTNESS_r0{1..9}):
# every registered query has a driver-green row; staleness is the
# ordering signal. Head = (1) the 4 round-10 additions (never
# checked — exactly the r9 verdict's <=4 cap), (2) the 4 r5-stale
# names (the r9-documented split cohort, positioned to lead this
# window as instructed), (3) the alphabetically-first 42 of the 50
# r6-stale names. The remaining 8 r6-stale names SPILL to r11 (one
# per addition beyond the window arithmetic; the spill list is
# recorded in COVERAGE.md's round-10 block):
#   q7_nation_trade_volume
#   q8_nation_market_share
#   q9_product_profit
#   revenue_moving_avg_7d
#   segment_price_percentiles
#   tokenizer_bpe_encode
#   top3_customers_per_nation
#   urgent_customers_by_nation
_CHECK_FIRST = (
    # (1) round-10 additions (never driver-checked)
    "dedup_minhash128_pairs",
    "media_dedup_exact",
    "media_phash_hamming",
    "tokenizer_bpe_byte_coverage",
    # (2) r5-stale cohort (last green r05; judge-re-verified in r9)
    "events_conversion_funnel",
    "semdedup_embedding_prune",
    "tokenizer_bpe_curve",
    "tokenizer_bpe_merges",
    # (3) stalest driver cohort: last green in CORRECTNESS_r06 (42 of 50)
    "ann_ivf_native",
    "ann_lsh_bucketed",
    "ann_topk_cosine",
    "cte_nation_revenue",
    "customer_year_setops",
    "customers_without_orders",
    "dedup_minhash_lsh",
    "embedding_array_stats",
    "events_hourly_stats",
    "events_json_extract",
    "events_sessionize",
    "grouping_sets_revenue",
    "mktsegment_order_pivot",
    "monthly_revenue",
    "multimodal_ppm_stats",
    "multimodal_wav_features",
    "nation_price_trend",
    "order_priority_rollup",
    "orders_by_quarter",
    "part_name_analysis",
    "pipeline_clean_corpus",
    "price_bucket_distribution",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping_stats",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_brand_quantity_revenue",
    "q1_pricing_summary",
    "q20_heavy_shippers",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "q2_cheapest_part_per_type",
    "q3_shipping_priority",
    "q4_late_shipment_priority",
    "q5_local_supplier_volume",
    "q6_discount_revenue",
    "q6_forecast_revenue",
)

# Every registered query has at least one driver-green row;
# _CHECK_LAST holds everything outside _CHECK_FIRST so the head alone
# decides the window. Regenerate both blocks each round from the
# CORRECTNESS artifacts (scripts/rotation.py).
_CHECK_LAST = frozenset(
    {
        "ann_ivf_recall",
        "ann_ivf_topk",
        "ann_pq_recall",
        "approx_distinct_parts",
        "asof_last_view_before_purchase",
        "cluster_top_terms",
        "connector_bucketed_join",
        "connector_csv_roundtrip",
        "connector_json_roundtrip",
        "connector_orc_roundtrip",
        "connector_partitioned_sink_pruning",
        "corpus_cluster_split",
        "corpus_cross_source_overlap",
        "corpus_dedup_survivorship",
        "corpus_epoch_shuffle",
        "corpus_mix_sample",
        "corpus_pack_efficiency",
        "corpus_shard_assignment",
        "corpus_source_datasheet",
        "corpus_stratified_quota",
        "corpus_temperature_mix",
        "corpus_token_budget_curve",
        "corpus_weighted_sample",
        "customer_rfm_segments",
        "decontam_benchmark_overlap",
        "decontam_bloom_gate",
        "decontam_semantic_overlap",
        "dedup_band_calibration",
        "dedup_clusters",
        "dedup_exact",
        "dedup_incremental_delta",
        "dedup_ngram_containment",
        "dedup_ngram_jaccard",
        "dedup_savings_by_source",
        "dedup_simhash",
        "dedup_simhash64_hamming",
        "dedup_simhash_hamming",
        "dedup_source_overlap_matrix",
        "dedup_substring_runs",
        "dedup_threshold_sweep",
        "deletion_vector_plan",
        "doremi_domain_weights",
        "dsir_importance_weights",
        "dsl_train_ridge_predictions",
        "embedding_centroid_dispersion",
        "embedding_fisher_ratio",
        "embedding_matryoshka_audit",
        "embedding_nearest_centroid",
        "embedding_outlier_audit",
        "embedding_pca_power",
        "embedding_pq_codes",
        "embedding_quantize_int8",
        "embedding_similarity_pairs",
        "events_autocorrelation",
        "events_change_points",
        "events_fano_factor",
        "events_hourly_corr",
        "events_k_anonymity",
        "events_latest_per_user",
        "events_minute_gapfill",
        "events_new_users_cumulative",
        "events_rate_anomalies",
        "events_robust_anomalies",
        "events_rollup_incremental",
        "events_scd2_intervals",
        "events_scd2_merge_upsert",
        "events_time_weighted_value",
        "events_top_paths",
        "events_transition_entropy",
        "events_transition_matrix",
        "events_type_hour_cube",
        "events_user_cap_sample",
        "events_user_sessions",
        "events_value_range_join",
        "events_weekly_retention",
        "hybrid_search_rrf",
        "join_key_hotspots",
        "key_uniqueness_audit",
        "knn_graph_degrees",
        "knn_graph_triangles",
        "lakehouse_compaction_plan",
        "lang_id_confusion",
        "lineitem_decision_stump",
        "lineitem_feature_mi",
        "lineitem_numeric_profile",
        "lineitem_price_ols",
        "lineitem_pruning_effectiveness",
        "lineitem_winsorized_stats",
        "lineitem_zorder_layout",
        "media_ingest_inventory",
        "media_load_wav_features",
        "media_partition_pruning_decode",
        "multimodal_audio_energy",
        "multimodal_byte_histogram",
        "multimodal_frame_sample",
        "multimodal_ppm_resize_stats",
        "multimodal_wav_window_energy",
        "multimodal_y4m_frames",
        "multimodal_y4m_resize_stats",
        "nation_revenue_gini",
        "nation_revenue_trend",
        "nation_trade_pagerank",
        "nb_lang_confusion",
        "orders_amount_reconciliation",
        "orders_benford_audit",
        "orders_calendar_completeness",
        "orders_categorical_profile",
        "orders_forecast_backtest",
        "orders_merge_upsert",
        "orders_seasonality_index",
        "pack_concat_chunks",
        "part_abc_classification",
        "part_pair_affinity",
        "part_type_shares",
        "parttype_supplier_hhi",
        "pipeline_pretraining_corpus",
        "q7_nation_trade_volume",
        "q8_nation_market_share",
        "q9_product_profit",
        "quality_budget_selection",
        "quality_linear_margin",
        "quality_margin_deciles",
        "quality_source_percentile",
        "referential_integrity_audit",
        "retention_half_life",
        "revenue_moving_avg_7d",
        "salted_skew_join",
        "score_agreement_spearman",
        "segment_price_percentiles",
        "segment_spend_ttest",
        "source_length_drift_psi",
        "split_leakage_audit",
        "text_bigram_logprob",
        "text_bm25_topk",
        "text_bpe_token_stats",
        "text_chunk_windows",
        "text_heaps_law_fit",
        "text_heuristic_filters",
        "text_language_id",
        "text_ngram_novelty",
        "text_pii_redaction",
        "text_quality_repetition",
        "text_quality_scores",
        "text_readability_scores",
        "text_tfidf_top_terms",
        "text_token_stats",
        "text_unicode_pii_redaction",
        "text_unicode_token_stats",
        "text_unigram_surprisal",
        "text_winnow_fingerprints",
        "text_zipf_fit",
        "token_bigram_pmi",
        "token_heavy_hitters_cms",
        "token_vocab_coverage",
        "tokenizer_bpe_encode",
        "tokenizer_fertility",
        "top3_customers_per_nation",
        "urgent_customers_by_nation",
    }
)


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _CHECK_FIRST if k in mapping}
    mid = {
        k: v
        for k, v in mapping.items()
        if k not in head and k not in _CHECK_LAST
    }
    tail = {k: v for k, v in mapping.items() if k in _CHECK_LAST}
    return {**head, **mid, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return _ordered(dict(ORACLES))
