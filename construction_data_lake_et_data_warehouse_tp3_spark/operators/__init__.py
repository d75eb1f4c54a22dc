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
)


def all_queries():
    out = {}
    for mod_name in _MODULES:
        mod = import_module(f"{__name__}.{mod_name}")
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {mod_name}")
        out.update(mod.QUERIES)
    return out


def all_oracle():
    out = {}
    for mod_name in _MODULES:
        mod = import_module(f"{__name__}.{mod_name}")
        out.update(getattr(mod, "ORACLE", {}))
    return out
