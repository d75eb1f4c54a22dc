"""Join-type completions and remaining text/sampling operators.

Fills the join matrix the rest of the surface doesn't exercise (LEFT /
FULL OUTER, correlated EXISTS) plus two training-pipeline staples:
TF-IDF scoring and deterministic hash sampling (the reproducible,
engine-portable alternative to TABLESAMPLE — sampling by content hash
is stable across engines, partitions, and reruns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import money_round, money_round_sql, money_sum, money_sum_sql
from ..sources.registry import load_table

#: price tiers for the range join: [lo, hi) half-open bands.
PRICE_BANDS = (
    (0.0, 100_000.0, "T1"),
    (100_000.0, 200_000.0, "T2"),
    (200_000.0, 300_000.0, "T3"),
    (300_000.0, 400_000.0, "T4"),
    (400_000.0, 600_000.0, "T5"),
)


def customer_order_counts_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER + groupBy: every customer, zero-filled order counts
    (customers without orders survive the join)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey").agg(F.count("*").alias("n"))
    return (
        customer.join(counts, customer.c_custkey == counts.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        )
    )


def order_event_days_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of daily order activity vs daily event activity —
    days present on either side, null-marked on the other."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    o = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").alias("n_orders")
    )
    e = events.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    return o.join(e, "day", "full_outer").select(
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


def exists_high_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (left-semi): orders containing at least one
    lineitem with quantity ≥ 49."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = lineitem.where(F.col("l_quantity") >= 49).select("l_orderkey")
    return orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_orderstatus")


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 highest-scoring terms per document (first 50 docs).
    idf = ln((N+1)/(df+1)); identical double math both engines, round(6)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row aggregate (same trick as
    # above_avg_orders): keeps the whole computation ONE job instead of a
    # separate driver-side count() pass over the corpus.
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    tokens = docs.select(
        "doc_id", F.explode(F.expr("split(trim(text), '\\\\s+')")).alias("t")
    )
    tf = tokens.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("t").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_counts, "t")
        .where(F.col("doc_id") < 50)
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1).cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("t"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", F.col("t").alias("term"), "tfidf", "rank")
    )


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% hash sample of orders: md5-threshold on the key — stable
    across engines/partitions/reruns (unlike TABLESAMPLE), the standard
    reproducible-sampling trick for 100 TB experiment slices."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10).cast(
        "bigint"
    )
    return (
        orders.where(bucket % 10 == 0)
        .select("o_orderkey", "o_custkey", money_round("o_totalprice").alias("amount"))
    )


def price_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: orders against a tier table on
    lo <= o_totalprice < hi — the interval-join operator shape (SURVEY
    brief names range joins alongside as-of). Tiny band side ⇒ Spark
    plans BroadcastNestedLoopJoin, the right physical op for a non-equi
    join against a broadcastable dim: each order row tests 5 intervals
    map-side, no shuffle. Were the band side large, the scale move is
    equi-bucketing (floor(price / width) candidate keys) to restore a
    hash join; with 5 rows that would only add cost."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(list(PRICE_BANDS), "lo double, hi double, band string")
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum("o_totalprice").alias("total_value"),
        )
    )


def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit in one row: the constraint checks a warehouse
    load gate runs before accepting a batch — null FK, duplicate PK,
    referential misses against customer, domain violations (negative
    totals). Three 1-row aggregates crossJoined broadcast: the PK-dup
    count shuffles on o_orderkey with map-side partial counts, the FK
    miss is a left-anti count, the rest is a single scan. Generalizes
    the reference's per-record validation (json_to_datalake.py) to
    set-based checks."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = orders.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkey"
        ),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias(
            "negative_total"
        ),
    )
    dup_pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .agg(F.count("*").alias("duplicate_orderkeys"))
    )
    fk_miss = (
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").alias("fk_miss_customer"))
    )
    return (
        base.crossJoin(F.broadcast(dup_pk))
        .crossJoin(F.broadcast(fk_miss))
        .select(
            "n_rows",
            "null_custkey",
            "duplicate_orderkeys",
            "fk_miss_customer",
            "negative_total",
        )
    )


QUERIES = {
    "dq_audit_orders": dq_audit_orders,
    "customer_order_counts_left": customer_order_counts_left,
    "price_band_range_join": price_band_range_join,
    "order_event_days_full": order_event_days_full,
    "exists_high_qty_orders": exists_high_qty_orders,
    "tfidf_top_terms": tfidf_top_terms,
    "deterministic_sample": deterministic_sample,
}

_BANDS_VALUES = ", ".join(f"({lo}, {hi}, '{b}')" for lo, hi, b in PRICE_BANDS)

ORACLE = {
    "dq_audit_orders": """
        SELECT
            (SELECT count(*) FROM orders) AS n_rows,
            (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                AS null_custkey,
            (SELECT count(*) FROM (
                SELECT o_orderkey FROM orders
                GROUP BY 1 HAVING count(*) > 1)) AS duplicate_orderkeys,
            (SELECT count(*) FROM orders
             WHERE NOT EXISTS (SELECT 1 FROM customer
                               WHERE c_custkey = o_custkey))
                AS fk_miss_customer,
            (SELECT count(*) FROM orders WHERE o_totalprice < 0)
                AS negative_total
    """,
    "price_band_range_join": f"""
        WITH bands(lo, hi, band) AS (VALUES {_BANDS_VALUES})
        SELECT band,
               count(*) AS n_orders,
               {money_sum_sql('o_totalprice')} AS total_value
        FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY 1
    """,
    "customer_order_counts_left": """
        SELECT c_custkey AS user_id,
               CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        FROM customer
        LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
          ON c_custkey = o_custkey
    """,
    "order_event_days_full": """
        WITH o AS (
            SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
            FROM orders GROUP BY 1
        ),
        e AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n_events
            FROM events GROUP BY 1
        )
        SELECT coalesce(o.day, e.day) AS day,
               CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(n_events, 0) AS BIGINT) AS n_events
        FROM o FULL OUTER JOIN e ON o.day = e.day
    """,
    "exists_high_qty_orders": """
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity >= 49
        )
    """,
    "tfidf_top_terms": """
        WITH tok AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
            FROM documents
        ),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfc AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.t AS term,
                   round(tf.tf * ln((n.n_docs + 1) / CAST(dfc.df + 1 AS DOUBLE)), 6) AS tfidf
            FROM tf JOIN dfc ON tf.t = dfc.t CROSS JOIN n
            WHERE tf.doc_id < 50
        )
        SELECT doc_id, term, tfidf, rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
            FROM scored
        ) WHERE rank <= 3
    """,
    "deterministic_sample": f"""
        SELECT o_orderkey, o_custkey,
               {money_round_sql('o_totalprice')} AS amount
        FROM orders
        WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT % 10 = 0
    """,
}
