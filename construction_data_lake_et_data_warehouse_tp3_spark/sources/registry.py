"""Batch parquet source registry over the driver testdata star schema.

Replaces the reference's ksqlDB pull-query scans
(/root/reference/export_to_data_lake.py:81-94 — HTTP + NDJSON parse +
pandas) with native Spark parquet scans: columnar vectorized read,
predicate pushdown and column pruning arrive for free via Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier"})

#: Columns stored as TIMESTAMP(NANOS) in the driver parquet. Spark 4 reads
#: them (under spark.sql.legacy.parquet.nanosAsLong) as int64 nanoseconds;
#: we convert with integer DIV 1000 → timestamp_micros, which truncates
#: exactly like DuckDB's native ns→µs read, keeping the oracle comparable.
TIMESTAMP_NS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Pure `spark.read.parquet` — no caching here
    so every query plan keeps its scan node visible to pushdown/pruning."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in TIMESTAMP_NS_COLS.get(name, ()):
        field = df.schema[col]
        if field.dataType.simpleString() == "bigint":
            df = df.withColumn(
                col, F.expr(f"timestamp_micros(CAST({col} DIV 1000 AS BIGINT))")
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
