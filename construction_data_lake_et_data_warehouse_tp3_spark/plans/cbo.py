"""Cost-based-optimizer stats demo (VERDICT r1 §Next #10).

The remaining 100×-scale optimizer lever the engine exercises nowhere
else: table/column statistics (`ANALYZE TABLE ... COMPUTE STATISTICS`)
feeding Catalyst's CBO join reorder. At 100 TB the written join order in
a query is rarely the cheapest; with rowCount + NDV stats and
spark.sql.cbo.joinReorder, Catalyst re-derives the selectivity-first
order automatically — the same transformation tpch_q5 hand-codes.

Temp views can't carry stats, so the demo registers *external catalog
tables* over the same parquet (zero data copy), analyzes them, and diffs
the optimized logical plan of a deliberately badly-ordered join
(fact ⋈ fact first, filtered dim last) with CBO off vs on.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

#: the demo's deliberately bad join order: the two big tables join first,
#: the 90%-selective nation filter applies last. A cost-blind planner
#: executes it as written; CBO + stats pushes the filtered dim join first.
_BAD_ORDER_SQL = """
    SELECT n_name, count(*) AS n
    FROM {orders} JOIN {customer} ON o_custkey = c_custkey
    JOIN {nation} ON c_nationkey = n_nationkey
    WHERE n_name = 'FRANCE'
    GROUP BY n_name
"""


def register_stats_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...], suffix: str = "_stats"
) -> dict[str, str]:
    """External parquet catalog tables (stats need a catalog entry; temp
    views can't hold them). Returns logical→catalog name mapping."""
    out = {}
    for name in tables:
        cat_name = f"{name}{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {cat_name}")
        spark.catalog.createTable(cat_name, path=f"{sf_dir}/{name}.parquet", source="parquet")
        out[name] = cat_name
    return out


def analyze_tables(spark: SparkSession, names: list[str], all_columns: bool = True) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS] — one
    metadata-only pass per table; at 100 TB run it per-partition on
    ingest, not per-query."""
    for name in names:
        suffix = " FOR ALL COLUMNS" if all_columns else ""
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS{suffix}")


def table_row_count_stat(spark: SparkSession, name: str) -> int | None:
    """rowCount recorded in the catalog (None before ANALYZE)."""
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
        if row.col_name == "Statistics":
            match = re.search(r"(\d+) rows", row.data_type)
            if match:
                return int(match.group(1))
    return None


def _optimized_plan(spark: SparkSession, sql: str) -> str:
    return spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()


def cbo_join_order_demo(spark: SparkSession, sf_dir: str) -> dict:
    """Before/after: the optimized logical plan of _BAD_ORDER_SQL without
    stats+CBO vs with. Restores the session confs it flips."""
    mapping = register_stats_tables(spark, sf_dir, ("customer", "orders", "nation"))
    sql = _BAD_ORDER_SQL.format(
        orders=mapping["orders"], customer=mapping["customer"], nation=mapping["nation"]
    )
    saved = {
        key: spark.conf.get(key)  # SQL confs always resolve to a default
        for key in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    try:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        plan_off = _optimized_plan(spark, sql)
        analyze_tables(spark, list(mapping.values()))
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        plan_on = _optimized_plan(spark, sql)
    finally:
        for key, value in saved.items():
            spark.conf.set(key, value)
    return {
        "plan_without_stats": plan_off,
        "plan_with_stats": plan_on,
        "reordered": plan_off != plan_on,
        "row_counts": {
            name: table_row_count_stat(spark, cat) for name, cat in mapping.items()
        },
    }
