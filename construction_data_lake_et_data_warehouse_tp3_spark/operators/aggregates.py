"""Grouped aggregations — the heart of the reference's query surface
(SURVEY §2.4 #26-31: the implied ksqlDB continuous tables, semantics pinned
by /root/reference/sync_to_mysql.py:41-83 and data_lake_config.py:82-115).

Testdata mapping (FIXTURES.md §2): users ≙ customer (+nation for country),
transactions ≙ orders, products ≙ part via lineitem, payment events ≙ events.

Scale notes (100 TB posture):
- Every aggregation here is a single hash-aggregate with map-side partial
  aggregation (Catalyst HashAggregate partial→final) — one shuffle on the
  group keys, no driver-side work.
- Dimension joins (customer→nation) broadcast the dim side so the fact scan
  never shuffles for enrichment.
- `unique_buyers` uses exact COUNT(DISTINCT) to match the oracle; the
  `product_purchase_counts_approx` variant swaps in approx_count_distinct
  (HLL, single-pass, no distinct expand) — the variant to use at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import (
    amount_bucket,
    derive_email,
    exchange_rate_for_priority,
    exchange_rate_sql,
    money_avg,
    money_avg_sql,
    money_round,
    money_round_sql,
    money_sum,
    money_sum_sql,
    ratio_avg,
    ratio_avg_sql,
)
from ..sources.registry import load_table

# The oracle SQL for the user summaries still joins first and groups by all
# six user columns (the reference's literal shape, sync_to_mysql.py:42-55);
# the Spark implementations aggregate on compact keys then enrich — the
# parity check proves the two shapes equivalent.

_USER_TXN_SQL = """
    SELECT c_custkey AS user_id,
           c_name AS user_name,
           lower(replace(c_name, '#', '_')) || '@example.com' AS user_email,
           n_name AS user_country,
           c_mktsegment AS user_city,
           o_orderstatus AS transaction_type,
           o_totalprice AS amount,
           o_orderdate AS ts,
           o_orderpriority AS priority
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
"""



def user_transaction_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#26 `user_transaction_summary`: GROUP BY user × transaction_type →
    SUM/COUNT/AVG/MIN/MAX(amount), MAX(ts) (sync_to_mysql.py:42-55).

    Aggregate-then-enrich: the hash aggregate runs on the compact
    (custkey, status) key over the bare fact scan, and the user-attribute
    dims join AFTER reduction — at 100 TB the agg state carries 2 small
    keys instead of 6 wide strings, and the dim join touches one row per
    group instead of one per transaction. (The user attributes are
    functionally dependent on custkey, so results are identical to
    grouping by all six columns — the oracle checks exactly that.)"""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = orders.groupBy("o_custkey", "o_orderstatus").agg(
        money_sum("o_totalprice").alias("total_amount"),
        F.count("*").alias("transaction_count"),
        money_avg("o_totalprice").alias("avg_amount"),
        money_round(F.min("o_totalprice")).alias("min_amount"),
        money_round(F.max("o_totalprice")).alias("max_amount"),
        F.max("o_orderdate").cast("date").alias("last_transaction_date"),
    )
    return (
        agg.join(customer, agg.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            customer.c_custkey.alias("user_id"),
            customer.c_name.alias("user_name"),
            derive_email(customer.c_name).alias("user_email"),
            nation.n_name.alias("user_country"),
            customer.c_mktsegment.alias("user_city"),
            F.col("o_orderstatus").alias("transaction_type"),
            "total_amount",
            "transaction_count",
            "avg_amount",
            "min_amount",
            "max_amount",
            "last_transaction_date",
        )
    )


def user_transaction_summary_eur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#27 EUR variant: amounts × exchange_rate before aggregation
    (sync_to_mysql.py:56-67; rate default 1.0 at :279). Same
    aggregate-then-enrich shape as #26."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    eur = orders.withColumn(
        "exchange_rate",
        F.coalesce(exchange_rate_for_priority("o_orderpriority"), F.lit(1.0)),
    ).withColumn("amount_eur", F.col("o_totalprice") * F.col("exchange_rate"))
    agg = eur.groupBy("o_custkey", "o_orderstatus").agg(
        money_sum("amount_eur").alias("total_amount_eur"),
        F.count("*").alias("transaction_count"),
        money_avg("amount_eur").alias("avg_amount_eur"),
        ratio_avg("exchange_rate").alias("exchange_rate"),
    )
    return (
        agg.join(customer, agg.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            customer.c_custkey.alias("user_id"),
            customer.c_name.alias("user_name"),
            derive_email(customer.c_name).alias("user_email"),
            nation.n_name.alias("user_country"),
            customer.c_mktsegment.alias("user_city"),
            F.col("o_orderstatus").alias("transaction_type"),
            "total_amount_eur",
            "transaction_count",
            "avg_amount_eur",
            "exchange_rate",
        )
    )


def payment_method_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#28 GROUP BY payment_method → SUM/COUNT/AVG (sync_to_mysql.py:68-73).
    Testdata stand-in: events.event_type as the method, value as amount."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("payment_method"))
        .agg(
            money_sum("value").alias("total_amount"),
            F.count("*").alias("transaction_count"),
            money_avg("value").alias("avg_amount"),
        )
    )


def product_purchase_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#29 GROUP BY product → COUNT, SUM(revenue), AVG(price),
    COUNT(DISTINCT buyer) (sync_to_mysql.py:74-83).

    The lineitem⋈orders fact-fact join must precede aggregation (the
    distinct buyer key lives on orders), but the part dim joins AFTER —
    the aggregate keys on the bare l_partkey, and product attributes
    broadcast onto ~|parts| grouped rows instead of |lineitem| rows."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("purchase_count"),
            money_sum("l_extendedprice").alias("total_revenue"),
            money_avg("l_extendedprice").alias("avg_price"),
            F.countDistinct("o_custkey").alias("unique_buyers"),
        )
    )
    return agg.join(F.broadcast(part), agg.l_partkey == part.p_partkey).select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("product_name"),
        F.col("p_brand").alias("product_category"),
        "purchase_count",
        "total_revenue",
        "avg_price",
        "unique_buyers",
    )


def product_purchase_counts_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#29 at-scale variant: approx_count_distinct (HLL++) replaces the exact
    distinct — single-pass, no expand, the right call at 100 TB (SURVEY §2.4
    note). rows-only checked (approximate ⇒ no value-hash oracle)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    li = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).join(
        part, lineitem.l_partkey == part.p_partkey
    )
    return li.groupBy(
        F.col("p_partkey").alias("product_id"),
        F.col("p_brand").alias("product_category"),
    ).agg(
        F.count("*").alias("purchase_count"),
        money_sum("l_extendedprice").alias("total_revenue"),
        F.approx_count_distinct("o_custkey").alias("unique_buyers_approx"),
    )


#: relative tolerance for the HLL++ bounds check — approx_count_distinct's
#: default rsd is 0.05 (one standard deviation); 3σ + slack keeps the
#: check deterministic-in-practice while still meaning something.
APPROX_DISTINCT_EPS = 0.20


def product_purchase_counts_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed bounds check of the HLL++ sketch: per brand (~25
    groups, large counts), compute exact AND approximate distinct buyers
    in one aggregation and emit the accuracy claim as a boolean. The
    driver hash-checks exact values + the claim; the raw estimate stays
    rows-only in product_purchase_counts_approx."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    li = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).join(
        F.broadcast(part), lineitem.l_partkey == part.p_partkey
    )
    g = li.groupBy(F.col("p_brand").alias("product_category")).agg(
        F.count("*").alias("purchase_count"),
        F.countDistinct("o_custkey").alias("unique_buyers"),
        F.approx_count_distinct("o_custkey").alias("unique_buyers_approx"),
    )
    return g.select(
        "product_category",
        "purchase_count",
        "unique_buyers",
        (
            F.abs(F.col("unique_buyers_approx") - F.col("unique_buyers"))
            <= F.lit(APPROX_DISTINCT_EPS) * F.col("unique_buyers")
        ).alias("within_tolerance"),
    )


def amount_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#31 bucketed histogram: CASE bucket on amount → group counts
    (amount_bucket domain kafka_producer.py:49)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("amount_bucket", amount_bucket("value"))
        .groupBy("amount_bucket")
        .agg(
            F.count("*").alias("n_transactions"),
            money_sum("value").alias("bucket_total"),
        )
    )


QUERIES = {
    "user_transaction_summary": user_transaction_summary,
    "user_transaction_summary_eur": user_transaction_summary_eur,
    "payment_method_totals": payment_method_totals,
    "product_purchase_counts": product_purchase_counts,
    "product_purchase_counts_approx": product_purchase_counts_approx,
    "product_purchase_counts_approx_check": product_purchase_counts_approx_check,
    "amount_bucket_histogram": amount_bucket_histogram,
}

# Portable money-aggregation SQL fragments (see functions.scalar docstring).
MS_AMOUNT = money_sum_sql("amount")
MA_AMOUNT = money_avg_sql("amount")
MS_EUR = money_sum_sql("amount * exchange_rate")
MA_EUR = money_avg_sql("amount * exchange_rate")
RA_RATE = ratio_avg_sql("exchange_rate")
MS_VALUE = money_sum_sql("value")
MA_VALUE = money_avg_sql("value")
MS_PRICE = money_sum_sql("l_extendedprice")
MA_PRICE = money_avg_sql("l_extendedprice")

ORACLE = {
    # bounds-check twin: oracle asserts the exact values + the tolerance
    # CLAIM (literal TRUE); Spark computes the boolean from its live HLL
    "product_purchase_counts_approx_check": """
        SELECT p_brand AS product_category,
               count(*) AS purchase_count,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS unique_buyers,
               TRUE AS within_tolerance
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "user_transaction_summary": f"""
        WITH txn AS ({_USER_TXN_SQL})
        SELECT user_id, user_name, user_email, user_country, user_city,
               transaction_type,
               {MS_AMOUNT} AS total_amount,
               count(*) AS transaction_count,
               {MA_AMOUNT} AS avg_amount,
               {money_round_sql('min(amount)')} AS min_amount,
               {money_round_sql('max(amount)')} AS max_amount,
               CAST(max(ts) AS DATE) AS last_transaction_date
        FROM txn
        GROUP BY 1, 2, 3, 4, 5, 6
    """,
    "user_transaction_summary_eur": f"""
        WITH txn AS ({_USER_TXN_SQL}),
        eur AS (
            SELECT *, COALESCE({exchange_rate_sql('priority')}, 1.0) AS exchange_rate
            FROM txn
        )
        SELECT user_id, user_name, user_email, user_country, user_city,
               transaction_type,
               {MS_EUR} AS total_amount_eur,
               count(*) AS transaction_count,
               {MA_EUR} AS avg_amount_eur,
               {RA_RATE} AS exchange_rate
        FROM eur
        GROUP BY 1, 2, 3, 4, 5, 6
    """,
    "payment_method_totals": f"""
        SELECT event_type AS payment_method,
               {MS_VALUE} AS total_amount,
               count(*) AS transaction_count,
               {MA_VALUE} AS avg_amount
        FROM events
        GROUP BY 1
    """,
    "product_purchase_counts": f"""
        SELECT p_partkey AS product_id,
               p_name AS product_name,
               p_brand AS product_category,
               count(*) AS purchase_count,
               {MS_PRICE} AS total_revenue,
               {MA_PRICE} AS avg_price,
               count(DISTINCT o_custkey) AS unique_buyers
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3
    """,
    "amount_bucket_histogram": f"""
        SELECT CASE WHEN value < 10 THEN '0-10'
                    WHEN value < 50 THEN '10-50'
                    WHEN value < 100 THEN '50-100'
                    ELSE '>100' END AS amount_bucket,
               count(*) AS n_transactions,
               {MS_VALUE} AS bucket_total
        FROM events
        GROUP BY 1
    """,
}
