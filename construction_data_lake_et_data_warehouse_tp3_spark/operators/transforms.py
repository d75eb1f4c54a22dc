"""Projections / filters / derived streams (SURVEY §2.2 #14-22, §2.8 #54-55).

These are the reference's implied ksqlDB derived streams (anonymized,
blacklisted) plus its retention predicate, re-expressed as declarative
DataFrame plans: filters reach the parquet scan as PushedFilters, the
blacklist is a broadcast left-semi join, and the retention predicate is a
pure partition-prunable date comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import amount_bucket, anonymize_user, money_sum, money_sum_sql
from ..sources.registry import load_table

#: Regions whose customers are "blacklisted" — deterministic stand-in for
#: the reference's blacklisted-cities set (data_lake_config.py:71-78).
BLACKLISTED_REGIONS = ("ASIA", "AFRICA")


def anonymize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#54/#31: anonymized derived stream — hash_user (sha2) + amount_bucket
    CASE + day-granular timestamp (kafka_producer.py:46-51).

    Buckets scale reference bounds ×1000 to match o_totalprice's domain."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        anonymize_user("o_custkey").alias("hash_user"),
        amount_bucket(
            "o_totalprice",
            bounds=(10_000.0, 50_000.0, 100_000.0),
            labels=("0-10k", "10-50k", "50-100k", ">100k"),
        ).alias("amount_bucket"),
        F.col("o_orderdate").cast("date").alias("txn_date"),
    )


def blacklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#22 blacklist derived stream: transactions whose customer sits in a
    blacklisted region — broadcast LEFT SEMI join, so the fact side never
    shuffles (data_lake_config.py:71-78 semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    bad_customers = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name").isin(*BLACKLISTED_REGIONS))
        .select("c_custkey")
    )
    return orders.join(
        F.broadcast(bad_customers),
        orders.o_custkey == bad_customers.c_custkey,
        "left_semi",
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")


def retention_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#21/#77 retention predicate: day-partitions older than
    max(ts) - 21 days, with per-day row counts — the dry-run preview of
    data_retention.py:35-51. On a date-partitioned lake table this plan is
    pure partition pruning (no data read beyond partition columns)."""
    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg(
        (F.max("ts") - F.expr("INTERVAL 21 DAYS")).alias("cutoff")
    )
    return (
        events.crossJoin(F.broadcast(cutoff))
        .where(F.col("ts") < F.col("cutoff"))
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n_rows"))
    )


def projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#14-16 named projection with schema enforcement (fixes the silent
    arity-mismatch defect sync_to_mysql.py:110-114): project the dim_users
    payload out of wide customer rows, deduplicated on the PK."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("user_name"),
            F.col("n_name").alias("user_country"),
            F.col("c_mktsegment").alias("user_city"),
        )
        .dropDuplicates(["user_id"])
    )


def union_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set op: UNION ALL of two transaction-shaped feeds (the Spark
    analog of the reference's per-topic buffers,
    kafka_consumer_datalake.py:55-66) then per-source totals."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    o = orders.select(
        F.lit("orders").alias("src"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_totalprice").alias("amount"),
    )
    e = events.select(
        F.lit("events").alias("src"),
        F.col("user_id"),
        F.col("value").alias("amount"),
    )
    return (
        o.unionByName(e)
        .groupBy("src")
        .agg(F.count("*").alias("n_rows"), money_sum("amount").alias("total_amount"))
    )


QUERIES = {
    "anonymize_stream": anonymize_stream,
    "blacklist_filter": blacklist_filter,
    "retention_candidates": retention_candidates,
    "projection_pushdown": projection_pushdown,
    "union_transactions": union_transactions,
}

ORACLE = {
    "anonymize_stream": """
        SELECT sha256(CAST(o_custkey AS VARCHAR)) AS hash_user,
               CASE WHEN o_totalprice < 10000 THEN '0-10k'
                    WHEN o_totalprice < 50000 THEN '10-50k'
                    WHEN o_totalprice < 100000 THEN '50-100k'
                    ELSE '>100k' END AS amount_bucket,
               CAST(o_orderdate AS DATE) AS txn_date
        FROM orders
    """,
    "blacklist_filter": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name IN ('ASIA', 'AFRICA')
        )
    """,
    "retention_candidates": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n_rows
        FROM events
        WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 21 DAY
        GROUP BY 1
    """,
    "projection_pushdown": """
        SELECT c_custkey AS user_id,
               c_name AS user_name,
               n_name AS user_country,
               c_mktsegment AS user_city
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
    """,
    "union_transactions": f"""
        WITH u AS (
            SELECT 'orders' AS src, o_custkey AS user_id, o_totalprice AS amount FROM orders
            UNION ALL
            SELECT 'events' AS src, user_id, value AS amount FROM events
        )
        SELECT src, count(*) AS n_rows, {money_sum_sql('amount')} AS total_amount
        FROM u GROUP BY 1
    """,
}
