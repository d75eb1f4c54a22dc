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
)


# Enumeration priority for the driver's correctness harness, which checks at
# most ~50 queries per round in registry order.  Queries with no driver-green
# row in any prior round enumerate first so every query accumulates at least
# one CORRECTNESS_r{N} row across rounds; long-green queries rotate to the
# back.  (CORRECTNESS_r01/r02 each contained exactly 50 rows while the
# registry held 69 — see VERDICT.md round 2, "Next round" item 1.)
_DRIVER_PRIORITY = (
    # new in r04 — never driver-checked
    "tpch_q2",
    "tpch_q4",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    "pack_sequences",
    "mixture_resample",
    "edit_distance_pairs",
    "triangle_participation",
    "lm_surprisal",
    "substring_dup_pairs",
    "kmeans_embeddings",
    "ivf_kmeans_topk",
    "training_manifest",
    "resample_daily_revenue",
    "session_window_stats",
    "dq_audit_orders",
    "unpivot_status_revenue",
    "hopping_window_events",
    "ranking_windows_showcase",
    "pagerank_products",
    "tpch_q7",
    "tpch_q14",
    "tpch_q8",
    "tpch_q15",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "quality_filters",
    "decontaminate",
    "repetition_stats",
    "pii_scrub",
    "domain_mix",
    "length_histogram",
    # green in r01/r02 but rotated out of the r03 artifact — refresh
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "event_sessions",
    "asof_latest_order",
    "daily_event_stats",
    "dedup_exact",
    "minhash_lsh_candidates",
    "scalar_datetime_ops",
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
