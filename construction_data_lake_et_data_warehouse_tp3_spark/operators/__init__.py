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
)


# Enumeration priority for the driver's correctness harness, which checks at
# most ~50 queries per round in registry order.  Queries with no driver-green
# row in any prior round enumerate first so every query accumulates at least
# one CORRECTNESS_r{N} row across rounds; long-green queries rotate to the
# back.  (CORRECTNESS_r01/r02 each contained exactly 50 rows while the
# registry held 69 — see VERDICT.md round 2, "Next round" item 1.)
_DRIVER_PRIORITY = (
    # new in r03 — never driver-checked
    "ppm_pixel_stats",
    # never driver-checked through r02
    "ann_ivf_topk",
    "apply_in_pandas_group_stats",
    "bpe_token_count",
    "doc_fingerprint",
    "embedding_dup_pairs_bucketed",
    "lang_id",
    "lsh_buckets",
    "minhash_verified_dups",
    "multimodal_features",
    "pandas_scalar_norm",
    "pandas_udaf_value_stats",
    "simhash_hamming_pairs",
    "text_quality",
    "token_count",
    "word_freq_topk",
    # green in r01 but rotated out of the r02 artifact
    "cosine_topk",
    "embedding_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    # new in r03 — never driver-checked
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
