"""Data-profiling operator (r5h) — the "what is in this table" pass a
warehouse runs on arrival: per-column null counts, distinct counts, and
min/max, emitted as one row per column.

Reference parity anchor: the reference eyeballs dataframes ad hoc
(reference/export_to_data_lake.py loads then prints); this is the
systematized profile every ingestion pipeline wants first.

Scale: ONE scan, one aggregation row.  count(DISTINCT) over N columns
expands rows N-fold before the partial aggregation (Spark's expand) —
at 100 TB swap countDistinct for approx_count_distinct per column (the
HLL twin this repo benchmarks in product_purchase_counts_approx) and
the plan collapses to a single pass with constant state; the row-per-
column pivot at the end is a map-side explode of the 1-row aggregate.

The oracle derives the same profile as a UNION ALL of per-column
aggregates — an independent shape, so the expand+pivot path is
cross-checked, not mirrored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

#: profiled table + columns (order fixed for the output contract).
PROFILE_TABLE = "orders"
PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def profile_df(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Profile arbitrary columns of any DataFrame — the reusable core of
    profile_table, also surfaced as the ``profile`` CLI verb.

    Column names are validated against df.columns and backtick-quoted in
    every generated expression: the CLI path takes arbitrary parquet
    column names (spaces, hyphens, reserved words), and an unvalidated
    name would otherwise be evaluated as raw SQL expression text."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    # floating columns render through DECIMAL(38,6): a raw double→string
    # cast goes scientific above 1e7 on the JVM ('5.0E7') while DuckDB
    # prints positionally ('50000000.0') — the profile's one-schema
    # string contract would silently diverge on any big-money column
    # (dirty-input parity sweep, extreme-magnitude class). The decimal
    # hop is nanvl+TRY_CAST-guarded (ADVICE r8): under ANSI mode a plain
    # CAST raises on NaN/Infinity or |x| ≥ 1e32, aborting the WHOLE
    # profile for one dirty value — such values quarantine to NULL
    # instead, matching the money helpers' NaN posture (the oracle
    # applies the identical guard).
    floating = {
        f.name for f in df.schema.fields if f.dataType.typeName() in ("double", "float")
    }
    aggs = [F.count("*").alias("n_rows")]
    for i, c in enumerate(cols):
        q = "`" + c.replace("`", "``") + "`"
        render = (
            (
                lambda e: "CAST(TRY_CAST(nanvl("
                f"{e}, CAST(NULL AS DOUBLE)) AS DECIMAL(38,6)) AS STRING)"
            )
            if c in floating
            else (lambda e: f"CAST({e} AS STRING)")
        )
        aggs += [
            F.expr(
                f"CAST(sum(CASE WHEN {q} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias(f"c{i}__nulls"),
            F.countDistinct(c).alias(f"c{i}__distinct"),
            F.expr(render(f"min({q})")).alias(f"c{i}__min"),
            F.expr(render(f"max({q})")).alias(f"c{i}__max"),
        ]
    one = df.agg(*aggs)
    structs = ", ".join(
        "struct('{name}' AS col_name, n_rows, c{i}__nulls AS n_nulls,"
        " c{i}__distinct AS n_distinct, c{i}__min AS min_value,"
        " c{i}__max AS max_value)".format(name=c.replace("'", "\\'"), i=i)
        for i, c in enumerate(cols)
    )
    return one.select(F.explode(F.expr(f"array({structs})")).alias("p")).select(
        "p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct", "p.min_value", "p.max_value"
    )


def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct, min/max (as
    strings, so the profile has one schema across column types)."""
    return profile_df(load_table(spark, sf_dir, PROFILE_TABLE), PROFILE_COLS)


#: the profiled table's floating columns (the oracle mirrors profile_df's
#: DECIMAL(38,6) rendering for them).
_FLOATING_COLS = {"o_totalprice"}


def _profile_oracle() -> str:
    parts = []
    for c in PROFILE_COLS:
        if c in _FLOATING_COLS:
            # same NaN/overflow quarantine as profile_df: NaN → NULL
            # before the decimal hop, TRY_CAST NULLs what won't fit
            rmin = (
                f"CAST(TRY_CAST(CASE WHEN isnan(min({c})) THEN NULL "
                f"ELSE min({c}) END AS DECIMAL(38,6)) AS VARCHAR)"
            )
            rmax = (
                f"CAST(TRY_CAST(CASE WHEN isnan(max({c})) THEN NULL "
                f"ELSE max({c}) END AS DECIMAL(38,6)) AS VARCHAR)"
            )
        else:
            rmin = f"CAST(min({c}) AS VARCHAR)"
            rmax = f"CAST(max({c}) AS VARCHAR)"
        parts.append(
            f"""SELECT '{c}' AS col_name,
                   count(*) AS n_rows,
                   CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_nulls,
                   count(DISTINCT {c}) AS n_distinct,
                   {rmin} AS min_value,
                   {rmax} AS max_value
            FROM {PROFILE_TABLE}"""
        )
    return "\n        UNION ALL\n        ".join(parts)


QUERIES = {"profile_table": profile_table}
ORACLE = {"profile_table": _profile_oracle()}
