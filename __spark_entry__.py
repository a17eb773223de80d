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
# Round-11 rotation (scripts/rotation.py over CORRECTNESS_r0{1..10}):
# every registered query has a driver-green row; staleness is the
# ordering signal. Head = (1) the 8 r6-stale names spilled from the
# r10 window (the r10 verdict's ask #1: they lead this round),
# (2) the 4 round-11 additions (never checked — exactly the <=4 cap),
# (3) the alphabetically-first 38 of the 50 r7-stale names. The
# remaining 12 r7-stale names SPILL to r12 (recorded in COVERAGE.md's
# round-11 block):
#   multimodal_y4m_frames
#   multimodal_y4m_resize_stats
#   nation_revenue_trend
#   orders_benford_audit
#   orders_categorical_profile
#   orders_seasonality_index
#   part_abc_classification
#   part_pair_affinity
#   part_type_shares
#   referential_integrity_audit
#   text_ngram_novelty
#   text_winnow_fingerprints
_CHECK_FIRST = (
    # (1) r6-stale spill cohort (judge r10 ask #1: these lead r11)
    "q7_nation_trade_volume",
    "q8_nation_market_share",
    "q9_product_profit",
    "revenue_moving_avg_7d",
    "segment_price_percentiles",
    "tokenizer_bpe_encode",
    "top3_customers_per_nation",
    "urgent_customers_by_nation",
    # (2) round-11 additions (never driver-checked; cap <=4, used 4)
    "hll_distinct_audit",
    "media_audio_fingerprint_hamming",
    "media_video_ahash_hamming",
    "tokenizer_bpe_deep_merges",
    # (3) alphabetically-first 38 of the 50 r7-stale names
    "ann_ivf_recall",
    "ann_ivf_topk",
    "approx_distinct_parts",
    "asof_last_view_before_purchase",
    "cluster_top_terms",
    "corpus_dedup_survivorship",
    "corpus_shard_assignment",
    "corpus_temperature_mix",
    "customer_rfm_segments",
    "decontam_bloom_gate",
    "dedup_clusters",
    "dedup_incremental_delta",
    "dedup_ngram_jaccard",
    "dedup_substring_runs",
    "embedding_centroid_dispersion",
    "embedding_pca_power",
    "embedding_pq_codes",
    "embedding_quantize_int8",
    "embedding_similarity_pairs",
    "events_autocorrelation",
    "events_change_points",
    "events_fano_factor",
    "events_hourly_corr",
    "events_latest_per_user",
    "events_minute_gapfill",
    "events_new_users_cumulative",
    "events_time_weighted_value",
    "events_top_paths",
    "events_transition_matrix",
    "events_type_hour_cube",
    "events_value_range_join",
    "key_uniqueness_audit",
    "lakehouse_compaction_plan",
    "lineitem_price_ols",
    "lineitem_winsorized_stats",
    "multimodal_byte_histogram",
    "multimodal_ppm_resize_stats",
    "multimodal_wav_window_energy",
)

# Every registered query has at least one driver-green row;
# _CHECK_LAST holds everything outside _CHECK_FIRST so the head alone
# decides the window. Regenerate both blocks each round from the
# CORRECTNESS artifacts (scripts/rotation.py).
_CHECK_LAST = frozenset(
    {
        "ann_ivf_native",
        "ann_lsh_bucketed",
        "ann_pq_recall",
        "ann_topk_cosine",
        "connector_bucketed_join",
        "connector_csv_roundtrip",
        "connector_json_roundtrip",
        "connector_orc_roundtrip",
        "connector_partitioned_sink_pruning",
        "corpus_cluster_split",
        "corpus_cross_source_overlap",
        "corpus_epoch_shuffle",
        "corpus_mix_sample",
        "corpus_pack_efficiency",
        "corpus_source_datasheet",
        "corpus_stratified_quota",
        "corpus_token_budget_curve",
        "corpus_weighted_sample",
        "cte_nation_revenue",
        "customer_year_setops",
        "customers_without_orders",
        "decontam_benchmark_overlap",
        "decontam_semantic_overlap",
        "dedup_band_calibration",
        "dedup_exact",
        "dedup_minhash128_pairs",
        "dedup_minhash_lsh",
        "dedup_ngram_containment",
        "dedup_savings_by_source",
        "dedup_simhash",
        "dedup_simhash64_hamming",
        "dedup_simhash_hamming",
        "dedup_source_overlap_matrix",
        "dedup_threshold_sweep",
        "deletion_vector_plan",
        "doremi_domain_weights",
        "dsir_importance_weights",
        "dsl_train_ridge_predictions",
        "embedding_array_stats",
        "embedding_fisher_ratio",
        "embedding_matryoshka_audit",
        "embedding_nearest_centroid",
        "embedding_outlier_audit",
        "events_conversion_funnel",
        "events_hourly_stats",
        "events_json_extract",
        "events_k_anonymity",
        "events_rate_anomalies",
        "events_robust_anomalies",
        "events_rollup_incremental",
        "events_scd2_intervals",
        "events_scd2_merge_upsert",
        "events_sessionize",
        "events_transition_entropy",
        "events_user_cap_sample",
        "events_user_sessions",
        "events_weekly_retention",
        "grouping_sets_revenue",
        "hybrid_search_rrf",
        "join_key_hotspots",
        "knn_graph_degrees",
        "knn_graph_triangles",
        "lang_id_confusion",
        "lineitem_decision_stump",
        "lineitem_feature_mi",
        "lineitem_numeric_profile",
        "lineitem_pruning_effectiveness",
        "lineitem_zorder_layout",
        "media_dedup_exact",
        "media_ingest_inventory",
        "media_load_wav_features",
        "media_partition_pruning_decode",
        "media_phash_hamming",
        "mktsegment_order_pivot",
        "monthly_revenue",
        "multimodal_audio_energy",
        "multimodal_frame_sample",
        "multimodal_ppm_stats",
        "multimodal_wav_features",
        "multimodal_y4m_frames",
        "multimodal_y4m_resize_stats",
        "nation_price_trend",
        "nation_revenue_gini",
        "nation_revenue_trend",
        "nation_trade_pagerank",
        "nb_lang_confusion",
        "order_priority_rollup",
        "orders_amount_reconciliation",
        "orders_benford_audit",
        "orders_by_quarter",
        "orders_calendar_completeness",
        "orders_categorical_profile",
        "orders_forecast_backtest",
        "orders_merge_upsert",
        "orders_seasonality_index",
        "pack_concat_chunks",
        "part_abc_classification",
        "part_name_analysis",
        "part_pair_affinity",
        "part_type_shares",
        "parttype_supplier_hhi",
        "pipeline_clean_corpus",
        "pipeline_pretraining_corpus",
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
        "quality_budget_selection",
        "quality_linear_margin",
        "quality_margin_deciles",
        "quality_source_percentile",
        "referential_integrity_audit",
        "retention_half_life",
        "salted_skew_join",
        "score_agreement_spearman",
        "segment_spend_ttest",
        "semdedup_embedding_prune",
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
        "tokenizer_bpe_byte_coverage",
        "tokenizer_bpe_curve",
        "tokenizer_bpe_merges",
        "tokenizer_fertility",
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
