"""Join surface (SURVEY §2.3 #23-25): FK lookup with broadcast, star-schema
joins, and set-based miss detection.

The reference resolves FKs one row at a time over the network
(sync_to_mysql.py:146-152, 285-299 — two MySQL round-trips per fact row).
Here the dim side broadcasts once per executor and the probe stays inside
whole-stage codegen; misses surface as a left-anti set instead of a raised
exception on the first bad row (SURVEY §7 risk 1: set-wise semantics,
all misses reported at once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scalar import money_avg, money_avg_sql, money_sum, money_sum_sql
from ..sources.registry import load_table


def payment_method_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_payment_methods stand-in: distinct event types with deterministic
    dense ids (ROW_NUMBER over name order) — the engine-side equivalent of
    the reference's auto-increment dim (sync_to_mysql.py:146-152)."""
    events = load_table(spark, sf_dir, "events")
    # a NULL event_type is not a payment method: distinct() keeps the
    # NULL on both engines, but Spark's name sort puts it FIRST (id 1,
    # shifting every real id) while DuckDB sorts it LAST - the
    # dirty-input parity sweep caught the id skew; excluded on BOTH
    w = Window.orderBy("payment_method_name")
    return (
        events.where(F.col("event_type").isNotNull())
        .select(F.col("event_type").alias("payment_method_name"))
        .distinct()
        .withColumn("payment_method_id", F.row_number().over(w))
    )


def payment_method_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#23 FK lookup join + #35 fact build: resolve method name → id via a
    broadcast inner equi-join, then aggregate per id."""
    events = load_table(spark, sf_dir, "events")
    dim = payment_method_dim(spark, sf_dir)
    return (
        events.join(F.broadcast(dim), events.event_type == dim.payment_method_name)
        .groupBy("payment_method_id", "payment_method_name")
        .agg(
            money_sum("value").alias("total_amount"),
            F.count("*").alias("transaction_count"),
            money_avg("value").alias("avg_amount"),
        )
    )


def fk_miss_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#23 miss detection as LEFT ANTI: customers that placed no orders.
    (Reference raises ValueError on first miss, sync_to_mysql.py:150-151;
    the set-based plan reports the complete miss set in one pass.)"""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select(F.col("c_custkey").alias("user_id"), F.col("c_name").alias("user_name"))


def star_schema_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#24 star-schema query surface: fact orders ⋈ dim customer ⋈ nation ⋈
    region, revenue rollup per region/nation. Dims broadcast; the only
    shuffle is the final aggregation on (region, nation)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            money_sum("o_totalprice").alias("revenue"),
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


QUERIES = {
    "payment_method_lookup": payment_method_lookup,
    "fk_miss_detection": fk_miss_detection,
    "star_schema_revenue": star_schema_revenue,
}

ORACLE = {
    "payment_method_lookup": f"""
        WITH dim AS (
            SELECT payment_method_name,
                   ROW_NUMBER() OVER (ORDER BY payment_method_name) AS payment_method_id
            FROM (SELECT DISTINCT event_type AS payment_method_name FROM events
                  WHERE event_type IS NOT NULL)
        )
        SELECT payment_method_id, payment_method_name,
               {money_sum_sql('value')} AS total_amount,
               count(*) AS transaction_count,
               {money_avg_sql('value')} AS avg_amount
        FROM events JOIN dim ON event_type = payment_method_name
        GROUP BY 1, 2
    """,
    "fk_miss_detection": """
        SELECT c_custkey AS user_id, c_name AS user_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "star_schema_revenue": f"""
        SELECT r_name AS region, n_name AS nation,
               {money_sum_sql('o_totalprice')} AS revenue,
               count(*) AS n_orders,
               count(DISTINCT o_custkey) AS n_customers
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2
    """,
}
