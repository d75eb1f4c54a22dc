"""Synthetic payload generator (SURVEY §2.1 #5-6, §2.8 #44-48).

The reference's producer builds random JSON per topic in a Python loop
with time.sleep rate-limiting (/root/reference/kafka_producer.py:26-103).
Spark-first: `spark.range(n)` + column expressions generates batches
distributively (one narrow stage, no Python loop), and the `rate` stream
source replaces sleep-based pacing (rowsPerSecond ≙ --rate).

Determinism: rand(seed) makes batches reproducible; ids derive from the
row index like `_random_id` derives from the RNG (kafka_producer.py:22-23).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CURRENCIES = ("EUR", "USD", "GBP")  # kafka_producer.py:34
STATUSES = ("approved", "declined")  # :36
COUNTRIES = ("FR", "DE", "ES", "IT")  # :41
PAYMENT_METHODS = ("card", "paypal", "apple_pay")  # :42
REASONS = ("stolen_card", "fraud_pattern", "velocity")  # :56
BUCKETS = ("0-10", "10-50", "50-100", ">100")  # :49


def _choice(options: tuple[str, ...], seed_col) -> F.Column:
    """#46 random categorical: element_at(array(...), 1 + hash % k)."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(F.xxhash64(seed_col), F.lit(len(options))) + 1).cast("int"))


def _tx_id(i) -> F.Column:
    """#44 random id: tx_ + 8 hex chars derived from the row index."""
    return F.concat(F.lit("tx_"), F.substring(F.md5(i.cast("string")), 1, 8))


def _amount(i, seed: int = 42) -> F.Column:
    """#45 uniform 1.00..500.00 in cents (kafka_producer.py:33). Derived
    from the row index like every other generated column — F.rand's
    per-row values depend on partition layout, so seeded batches would
    only reproduce at a fixed parallelism (ADVICE r1)."""
    cents = F.pmod(F.xxhash64(i, F.lit(seed ^ 0x5EED)), F.lit(49_901))
    return (cents.cast("double") / 100.0) + 1.0


def transaction_batch(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """`transaction_stream` payloads (kafka_producer.py:29-37)."""
    df = spark.range(n)
    i = F.col("id")
    return df.select(
        _tx_id(i).alias("transaction_id"),
        (F.pmod(F.xxhash64(i, F.lit(seed)), F.lit(10_000)) + 1).alias("user_id"),  # #47
        _amount(i, seed).alias("amount"),
        _choice(CURRENCIES, i + 1).alias("currency"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias(
            "timestamp"
        ),  # #48 ISO-8601 Z
        _choice(STATUSES, i + 2).alias("status"),
    )


def flattened_batch(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """`transaction_flattened` payloads (kafka_producer.py:38-45)."""
    df = spark.range(n)
    i = F.col("id")
    return df.select(
        _tx_id(i).alias("transaction_id"),
        _choice(COUNTRIES, i + 3).alias("user_country"),
        _choice(PAYMENT_METHODS, i + 4).alias("payment_method"),
        _amount(i, seed).alias("amount"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias(
            "timestamp"
        ),
    )


def anonymized_batch(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """`transaction_stream_anonymized` (kafka_producer.py:46-51): hash_user
    + amount_bucket, the production shape of operators.anonymize_stream."""
    from ..functions.scalar import amount_bucket, anonymize_user

    df = transaction_batch(spark, n, seed)
    return df.select(
        anonymize_user("user_id").alias("hash_user"),
        amount_bucket("amount").alias("amount_bucket"),
        F.col("timestamp"),
    )


def blacklisted_batch(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """`transaction_stream_blacklisted` payloads (kafka_producer.py:52-58)."""
    df = spark.range(n)
    i = F.col("id")
    return df.select(
        _tx_id(i).alias("transaction_id"),
        (F.pmod(F.xxhash64(i, F.lit(seed)), F.lit(10_000)) + 1).alias("user_id"),
        _choice(REASONS, i + 5).alias("reason"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias(
            "timestamp"
        ),
    )


def transaction_rate_stream(spark: SparkSession, rows_per_second: int) -> DataFrame:
    """#64 rate-limited continuous generator: the streaming twin of
    transaction_batch (reference: time.sleep(1/rate),
    kafka_producer.py:89-98 → rate source rowsPerSecond)."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )  # columns: timestamp, value
    i = F.col("value")
    return stream.select(
        _tx_id(i).alias("transaction_id"),
        (F.pmod(F.xxhash64(i), F.lit(10_000)) + 1).alias("user_id"),
        F.round(F.rand(42) * 499.0 + 1.0, 2).alias("amount"),
        _choice(CURRENCIES, i + 1).alias("currency"),
        F.col("timestamp").alias("event_time"),
        _choice(STATUSES, i + 2).alias("status"),
    )
