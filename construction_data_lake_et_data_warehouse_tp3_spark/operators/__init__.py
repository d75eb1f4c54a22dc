"""Query-surface operators.

Each module exposes two dicts:

- ``QUERIES``: name -> callable(spark, sf_dir) -> DataFrame  (Spark impl)
- ``ORACLE``:  name -> ANSI-SQL string for DuckDB over the same parquet
  views (omitted for non-SQL-expressible operators → driver records a
  rows-only check).

``all_queries()`` / ``all_oracle()`` merge every module for the driver
contract in /root/repo/__spark_entry__.py.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = (
    "aggregates",
    "transforms",
    "joins",
    "windows",
    "analytics",
    "setops",
    "relational_extras",
    "arrays",
    "tpch",
    "temporal",
    "dedup",
    "similarity",
    "text",
    "pipelines",
    "python_udfs",
    "curation",
    "quality",
    "clustering",
    "graph",
    "statistics",
    "retrieval",
    "sketches",
    "profiling",
)


# Enumeration priority for the driver's correctness harness, which checks at
# most ~50 queries per round in registry order.  Queries with no driver-green
# row in any prior round enumerate first so every query accumulates at least
# one CORRECTNESS_r{N} row across rounds; long-green queries rotate to the
# back.  (CORRECTNESS_r01/r02 each contained exactly 50 rows while the
# registry held 69 — see VERDICT.md round 2, "Next round" item 1.)
_DRIVER_PRIORITY = (
    # r4's one red row — oracle typing fixed in r5, needs its green row
    "length_histogram",
    # new in r5e — never driver-checked
    "kmv_distinct_users",
    "kmv_user_overlap",
    "cusum_changepoint",
    "revenue_trend_slope",
    "event_path_trigrams",
    "term_pmi_pairs",
    "rrf_hybrid_search",
    "session_bounce_rate",
    "target_encoding_loo",
    "feature_hashing",
    "k_anonymity_audit",
    "embedding_drift",
    "token_lorenz_by_source",
    "profile_table",
    "cumulative_unique_users",
    "seasonal_naive_backtest",
    "ppm_resize_blocks",
    "ab_test_zscore",
    "suspect_duplicate_orders",
    "value_percentiles_by_type",
    "item_similarity_topk",
    "link_prediction_jaccard",
    "degree_assortativity",
    "bootstrap_revenue_ci",
    "status_priority_mi",
    "seasonal_decomposition",
    "cohort_ltv",
    "revenue_gini",
    "daily_value_percentiles",
    "weekday_hour_heatmap",
    # new in r5d — never driver-checked
    "bm25_search",
    "shingle_containment_pairs",
    "jl_projection",
    "semdedup_pairs",
    "ngram_novelty",
    "source_lang_entropy",
    "time_to_conversion",
    # new in r5c — never driver-checked
    "purchase_streaks",
    "quantity_discount_corr",
    "ewma_daily_revenue",
    "last_touch_attribution",
    "inverted_index",
    "weighted_sample_topk",
    "y4m_keyframe_sample",
    "pareto_front_customers",
    "arrow_doc_stats",
    # new in r5b — never driver-checked
    "winsorized_order_stats",
    "benford_first_digit",
    "mom_revenue_growth",
    "scd2_user_state_history",
    "event_transition_matrix",
    "cluster_representatives",
    "leakage_safe_split",
    "label_centroids",
    "quantize_embeddings",
    "degree_distribution",
    "order_gap_histogram",
    "new_vs_returning_revenue",
    "dup_rate_by_source",
    "weekday_revenue_profile",
    "cms_heavy_hitters",
    "lang_id_confusion",
    "fixed_k_sample",
    "pareto_revenue_share",
    # new/reworked in r5 — never driver-checked in current form
    "wav_audio_stats",
    "bigram_surprisal",
    "chunk_documents",
    "interpolate_daily_revenue",
    "status_priority_chisq",
    "ppjoin_jaccard_pairs",
    "y4m_video_stats",
    "event_funnel",
    "retention_cohorts",
    "rfm_segments",
    "basket_lift",
    "revenue_anomalies",
    "dau_wau_stickiness",
    "median_order_value_approx_check",
    "product_purchase_counts_approx_check",
    "tpch_q2",
    "tpch_q11",
    "tpch_q16",
    "tpch_q20",
    # latest green row is CORRECTNESS_r02 — two rounds of churn unchecked
    "events_json_props",
    "tfidf_top_terms",
    "deterministic_sample",
    "pivot_status_revenue",
    "regexp_extract_ids",
    "customer_order_counts_left",
    "price_band_range_join",
    "order_event_days_full",
    "exists_high_qty_orders",
    "array_functions_showcase",
    "median_order_value",
    "median_order_value_approx",
    "product_purchase_counts_approx",
    # latest green row is CORRECTNESS_r03 — longest-unchecked refresh
    # (r4 greens rotate to the back; 49 r3 + the above ≈ fills the ~50-row
    # artifact over r5/r6)
    "user_transaction_summary",
    "user_transaction_summary_eur",
    "payment_method_totals",
    "product_purchase_counts",
    "amount_bucket_histogram",
    "anonymize_stream",
    "blacklist_filter",
    "retention_candidates",
    "projection_pushdown",
    "union_transactions",
    "payment_method_lookup",
    "fk_miss_detection",
    "star_schema_revenue",
    "top_orders_limit",
    "latest_version_per_feed",
    "top_event_per_user",
    "rollup_revenue",
    "rolling_7d_revenue",
    "grouping_sets_revenue",
    "above_avg_orders",
    "order_status_matrix",
    "cube_revenue",
    "time_bucket_rollup",
    "string_functions_showcase",
    "repeat_buyers_intersect",
    "open_only_buyers_except",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "embedding_dup_pairs",
    "embedding_dup_pairs_bucketed",
    "lsh_buckets",
    "token_count",
    "bpe_token_count",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "minhash_verified_dups",
    "simhash_hamming_pairs",
    "ann_ivf_topk",
    "word_freq_topk",
    "pandas_scalar_norm",
    "pandas_udaf_value_stats",
    "apply_in_pandas_group_stats",
    "multimodal_features",
    "ppm_pixel_stats",
    "dup_clusters",
    "corpus_curation",
    "stratified_sample",
)


def _prioritize(merged):
    ordered = {}
    for name in _DRIVER_PRIORITY:
        if name in merged:
            ordered[name] = merged[name]
    for name, value in merged.items():
        if name not in ordered:
            ordered[name] = value
    return ordered


def all_queries():
    out = {}
    for mod_name in _MODULES:
        mod = import_module(f"{__name__}.{mod_name}")
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {mod_name}")
        out.update(mod.QUERIES)
    return _prioritize(out)


def all_oracle():
    out = {}
    for mod_name in _MODULES:
        mod = import_module(f"{__name__}.{mod_name}")
        out.update(getattr(mod, "ORACLE", {}))
    return _prioritize(out)
