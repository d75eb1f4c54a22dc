"""Structured Streaming ingest (SURVEY §2.1 #4, #10; §2.9 #59-66).

Reference control flow — infinite consumer loop, per-topic buffers,
flush every batch_size messages, manual shutdown flush
(/root/reference/kafka_consumer_datalake.py:33-76) — maps onto
checkpointed micro-batches:

- continuous consumption  → streaming query with a processing-time trigger
- count-based flush       → trigger interval / maxOffsetsPerTrigger
  (count triggers don't exist; documented divergence, SURVEY §4)
- shutdown flush          → checkpoint + exactly-once file sink commit
  protocol (strict upgrade over at-least-once, SURVEY §2.9 #62)
- offset replay           → option("startingOffsets", "earliest")

The Kafka leg needs a broker; this module keeps the Kafka wiring behind
`kafka_source()` (exercised only when a broker is configured) and tests
the same pipeline through file/rate sources, which share every operator
downstream of the source node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: per-topic JSON schemas (FIXTURES.md §1, kafka_producer.py:26-75).
FEED_SCHEMAS: dict[str, T.StructType] = {
    "transaction_stream": T.StructType(
        [
            T.StructField("transaction_id", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("currency", T.StringType()),
            T.StructField("timestamp", T.StringType()),
            T.StructField("status", T.StringType()),
        ]
    ),
    "transaction_flattened": T.StructType(
        [
            T.StructField("transaction_id", T.StringType()),
            T.StructField("user_country", T.StringType()),
            T.StructField("payment_method", T.StringType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("timestamp", T.StringType()),
        ]
    ),
    "transaction_stream_anonymized": T.StructType(
        [
            T.StructField("hash_user", T.StringType()),
            T.StructField("amount_bucket", T.StringType()),
            T.StructField("timestamp", T.StringType()),
        ]
    ),
    "transaction_stream_blacklisted": T.StructType(
        [
            T.StructField("transaction_id", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("reason", T.StringType()),
            T.StructField("timestamp", T.StringType()),
        ]
    ),
}


def json_feed_schema(topic: str) -> T.StructType:
    if topic not in FEED_SCHEMAS:
        raise KeyError(f"no schema registered for topic {topic!r}")
    return FEED_SCHEMAS[topic]


#: The exact record schema Spark's Kafka source emits (spark-sql-kafka-0-10,
#: documented in the Structured Streaming + Kafka integration guide).
#: Shared by kafka_source at runtime and kafka_wire_twin in tests, so a
#: graph built on the twin is column-for-column the graph kafka_source
#: feeds — the first projection downstream can't tell them apart.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_source(
    spark: SparkSession, topics: str, bootstrap_servers: str = "localhost:9092"
) -> DataFrame:
    """#4 Kafka source with earliest replay (kafka_consumer_datalake.py:21-30).
    Requires the spark-sql-kafka package + a broker at runtime; option
    wiring is pinned by tests/test_kafka_wire.py against a recorder, and
    the downstream graph runs end-to-end on kafka_wire_twin."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", "earliest")
        .load()
    )


def encode_wire_records(
    df: DataFrame, topic: str, key_col: str | None = None
) -> DataFrame:
    """Serialize a payload DataFrame to Kafka wire records — the bytes the
    reference producer puts on the wire (kafka_producer.py:78-103:
    value = JSON-encoded payload, key = stringified id): value/key as
    binary, per-partition monotone offsets. The inverse of
    parse_kafka_json, used to record protocol fixtures for the twin."""
    from pyspark.sql.window import Window

    key = (
        F.col(key_col).cast("string").cast("binary")
        if key_col
        else F.lit(None).cast("binary")
    )
    part = F.lit(0).cast("int")
    offset = (
        F.row_number().over(Window.partitionBy(part).orderBy(F.monotonically_increasing_id()))
        - 1
    ).cast("long")
    return df.select(
        key.alias("key"),
        F.to_json(F.struct(*df.columns)).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        offset.alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def kafka_wire_twin(spark: SparkSession, records_dir: str) -> DataFrame:
    """Streaming source with KAFKA_WIRE_SCHEMA fed from recorded wire
    records (parquet dir) — the in-container stand-in for a broker: same
    schema, same bytes, same downstream graph
    (parse_kafka_json → ingest_stream_to_lake)."""
    return spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(records_dir)


def parse_kafka_json(raw: DataFrame, topic: str) -> DataFrame:
    """#3/#56: value bytes → typed columns via from_json (replaces the
    per-message json.loads at kafka_consumer_datalake.py:26)."""
    schema = json_feed_schema(topic)
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("payload")
    ).select("payload.*")


def split_dead_letters(
    raw: DataFrame, topic: str, required: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split for JSON ingest: `from_json` (PERMISSIVE) nulls
    the payload struct for malformed bytes, and parse_kafka_json silently
    drops the information — a production pipeline must QUARANTINE those
    records instead (the reference's consumer would crash the whole loop
    on one bad message, kafka_consumer_datalake.py:26 json.loads).

    Returns (good, dead) sharing ONE parse of the value bytes:
    - good: typed payload columns, rows whose JSON parsed AND carry every
      `required` column non-null;
    - dead: (raw_value, topic, reason, rejected_at) — reason is
      'malformed_json' or 'missing_required:<col>' (first missing wins).

    Works identically on static and streaming frames (pure column
    expressions, no state). Malformed-JSON detection uses PERMISSIVE
    mode's columnNameOfCorruptRecord — `payload IS NULL` alone misses
    '{'-prefixed garbage, for which from_json returns an all-null struct
    rather than a null one."""
    schema = json_feed_schema(topic)
    corrupt_col = "_corrupt_record"
    schema_with_corrupt = T.StructType(
        [*schema.fields, T.StructField(corrupt_col, T.StringType())]
    )
    value_str = F.col("value").cast("string")
    reason = F.when(
        F.col("payload").isNull() | F.col(f"payload.{corrupt_col}").isNotNull(),
        F.lit("malformed_json"),
    )
    for col in required:
        reason = reason.when(
            F.col(f"payload.{col}").isNull(), F.lit(f"missing_required:{col}")
        )
    parsed = raw.select(
        value_str.alias("__raw"),
        F.from_json(
            value_str,
            schema_with_corrupt,
            {"columnNameOfCorruptRecord": corrupt_col},
        ).alias("payload"),
    ).withColumn("__reason", reason)
    good = parsed.where(F.col("__reason").isNull()).select(
        *(f"payload.{f.name}" for f in schema.fields)
    )
    dead = parsed.where(F.col("__reason").isNotNull()).select(
        F.col("__raw").alias("raw_value"),
        F.lit(topic).alias("topic"),
        F.col("__reason").alias("reason"),
        F.current_timestamp().alias("rejected_at"),
    )
    return good, dead


def ingest_with_dlq(
    stream: DataFrame,
    topic: str,
    path: str,
    dlq_path: str,
    checkpoint: str,
    required: tuple[str, ...] = (),
):
    """Streaming ingest with quarantine: one foreachBatch READS each
    micro-batch once (persisted for the duration of the batch) and lands
    good rows in the partitioned lake sink and rejects in the dead-letter
    dir — two separate queries would double the Kafka egress, and an
    unpersisted batch would re-read the source per sink action. The
    column-level from_json runs per sink over the cached rows (cheap CPU,
    zero extra egress). The good path inherits the foreachBatch
    at-least-once contract; downstream exact-once consumers dedupe by key
    (dedup_redelivered) exactly as for the Kafka source itself."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.persist()
        try:
            good, dead = split_dead_letters(batch, topic, required)
            (
                with_processing_date(good)
                .write.mode("append")
                .partitionBy("year", "month", "day")
                .parquet(path)
            )
            if dead.limit(1).count():
                dead.write.mode("append").parquet(dlq_path)
        finally:
            batch.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def with_processing_date(df: DataFrame) -> DataFrame:
    """Processing-time partition columns (kafka_consumer_datalake.py:35-38;
    SURVEY §7 risk 3: ingest date, not event time, is the default)."""
    today = F.current_date()
    return (
        df.withColumn("year", F.year(today))
        .withColumn("month", F.month(today))
        .withColumn("day", F.dayofmonth(today))
    )


def ingest_stream_to_lake(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    processing_time: str = "5 seconds",
):
    """#10 partitioned streaming file sink with exactly-once checkpointing
    (kafka_consumer_datalake.py:33-46 buffering → micro-batches)."""
    writer = (
        with_processing_date(stream)
        .writeStream.format("parquet")
        .partitionBy("year", "month", "day")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def dedup_redelivered(
    stream: DataFrame,
    id_cols: tuple[str, ...] = ("transaction_id",),
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-least-once → effectively-once by key: drop redelivered records
    (same id within the watermark horizon) BEFORE they reach sinks or
    aggregations — `dropDuplicatesWithinWatermark`, whose per-key state
    is evicted once the watermark passes, unlike `dropDuplicates` whose
    streaming state grows forever. The reference's consumer redelivers on
    rebalance/restart (kafka_consumer_datalake.py:59-66 at-least-once
    buffering) and its MySQL upsert absorbs dups by PRIMARY KEY; this is
    the lake-side equivalent for append-only parquet sinks, where a dup
    row would otherwise land twice. State: O(in-flight keys per
    watermark window) per partition, shuffled on the id columns."""
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        [*id_cols]
    )


def streaming_user_totals(stream: DataFrame) -> DataFrame:
    """#66 unwindowed running aggregate in update mode — the exact
    semantics of the reference's ksqlDB tables (continuous GROUP BY,
    no window, no watermark)."""
    return stream.groupBy("user_id").agg(
        F.sum("amount").alias("total_amount"),
        F.count("*").alias("transaction_count"),
        F.avg("amount").alias("avg_amount"),
    )


def streaming_user_totals_distinct(stream: DataFrame) -> DataFrame:
    """#66 + SURVEY §7 risk 5: exact COUNT(DISTINCT) is unsupported in
    streaming aggregation — approx_count_distinct (HLL, mergeable state)
    is the streaming-legal form; the batch path keeps the exact count."""
    return stream.groupBy("currency").agg(
        F.sum("amount").alias("total_amount"),
        F.count("*").alias("transaction_count"),
        F.approx_count_distinct("user_id").alias("approx_unique_users"),
    )


def windowed_user_totals(
    stream: DataFrame,
    event_time_col: str = "event_time",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """#66 beyond-reference extension: event-time tumbling window +
    watermark for bounded state at scale (flagged as beyond-reference in
    SURVEY §2.9 — the reference never windows)."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window_duration), F.col("user_id"))
        .agg(
            F.sum("amount").alias("total_amount"),
            F.count("*").alias("transaction_count"),
        )
    )
