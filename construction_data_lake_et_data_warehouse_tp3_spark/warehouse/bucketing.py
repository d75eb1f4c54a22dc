"""Bucketed tables — shuffle-free co-located joins (SURVEY brief:
'bucketing for co-located joins').

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders) is
the shuffle of both sides on the join key. Writing both tables bucketed
by that key with the same bucket count pins rows to buckets at WRITE
time; Catalyst then plans the join with zero Exchange nodes — each task
joins bucket i of A with bucket i of B. The write pays one shuffle once;
every subsequent join is shuffle-free.

Spark requires bucketed data to live in a catalog table
(`saveAsTable` + spark.sql.warehouse.dir); tests assert the no-Exchange
plan property via plans.analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With matching
    bucket counts the physical plan has no Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])


def exchanges_in_plan(df: DataFrame) -> int:
    """Count Exchange (shuffle) nodes in the physical plan."""
    from ..plans.analysis import explain_str

    return explain_str(df, "simple").count("Exchange ")
