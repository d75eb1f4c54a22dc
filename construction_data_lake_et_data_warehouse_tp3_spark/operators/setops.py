"""Set operations and pivot (SURVEY §2.7 — the reference implies only
UNION via per-topic buffers; INTERSECT/EXCEPT/pivot complete the set
surface the oracle can check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import money_sum, money_sum_sql
from ..sources.registry import load_table


def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both an open ('O') and a fulfilled ('F')
    order — compiles to a left-semi join pair."""
    orders = load_table(spark, sf_dir, "orders")
    open_custs = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    fulfilled = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_custs.intersect(fulfilled).select(F.col("o_custkey").alias("user_id"))


def open_only_buyers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with an open order but no fulfilled order."""
    orders = load_table(spark, sf_dir, "orders")
    open_custs = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    fulfilled = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_custs.subtract(fulfilled).select(F.col("o_custkey").alias("user_id"))


def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot(): revenue per priority × status as columns.
    Explicit pivot values keep the schema deterministic (and let Catalyst
    skip the extra distinct-values job)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(money_sum("o_totalprice"))
        .withColumnRenamed("O", "rev_o")
        .withColumnRenamed("F", "rev_f")
        .withColumnRenamed("P", "rev_p")
    )


def regexp_extract_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract the numeric id embedded in customer names
    (identical semantics for this digit-class pattern in Java regex and
    DuckDB's RE2)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("bigint").alias("digits_num"),
        (F.regexp_extract("c_name", r"([0-9]+)", 1).cast("bigint") == F.col("c_custkey")).alias(
            "id_matches_name"
        ),
    )


QUERIES = {
    "repeat_buyers_intersect": repeat_buyers_intersect,
    "open_only_buyers_except": open_only_buyers_except,
    "pivot_status_revenue": pivot_status_revenue,
    "regexp_extract_ids": regexp_extract_ids,
}

ORACLE = {
    "repeat_buyers_intersect": """
        SELECT o_custkey AS user_id FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "open_only_buyers_except": """
        SELECT DISTINCT o_custkey AS user_id FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "pivot_status_revenue": f"""
        SELECT o_orderpriority,
               {money_sum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS rev_o,
               {money_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS rev_f,
               {money_sum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS rev_p
        FROM orders
        GROUP BY 1
    """,
    "regexp_extract_ids": """
        SELECT c_custkey,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits,
               CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS digits_num,
               CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) = c_custkey AS id_matches_name
        FROM customer
    """,
}
