"""Streaming tests (SURVEY §5 item 4): file-source micro-batches with
Trigger.AvailableNow, exactly-once partitioned file sink, unwindowed
update-mode aggregation (the reference's ksqlDB semantics), windowed
extension, and foreachBatch MERGE idempotency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.sources import generator
from construction_data_lake_et_data_warehouse_tp3_spark.streaming import (
    ingest_stream_to_lake,
    json_feed_schema,
    parse_kafka_json,
    streaming_user_totals,
    stream_to_warehouse,
    windowed_user_totals,
)
from construction_data_lake_et_data_warehouse_tp3_spark.warehouse import ParquetTable


@pytest.fixture
def tx_json_dir(spark, tmp_path):
    """A directory of JSON files standing in for Kafka topic partitions
    (same payload schema as the producer, kafka_producer.py:29-37)."""
    path = str(tmp_path / "topic")
    generator.transaction_batch(spark, 200).coalesce(2).write.mode("overwrite").json(path)
    return path


def _file_stream(spark, path):
    return (
        spark.readStream.schema(json_feed_schema("transaction_stream"))
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .json(path)
    )


class TestGenerator:
    def test_batch_shapes(self, spark):
        df = generator.transaction_batch(spark, 50)
        rows = df.collect()
        assert len(rows) == 50
        assert set(df.columns) == {
            "transaction_id", "user_id", "amount", "currency", "timestamp", "status",
        }
        sample = rows[0]
        assert sample["transaction_id"].startswith("tx_")
        assert 1 <= sample["user_id"] <= 10_000
        assert 1.0 <= sample["amount"] <= 500.0
        assert sample["currency"] in generator.CURRENCIES
        assert sample["timestamp"].endswith("Z")

    def test_all_topic_generators(self, spark):
        assert generator.flattened_batch(spark, 10).count() == 10
        anon = generator.anonymized_batch(spark, 10).collect()
        assert all(len(r["hash_user"]) == 64 for r in anon)  # sha2-256 hex
        assert all(r["amount_bucket"] in generator.BUCKETS for r in anon)
        bad = generator.blacklisted_batch(spark, 10).collect()
        assert all(r["reason"] in generator.REASONS for r in bad)

    def test_determinism(self, spark):
        a = generator.transaction_batch(spark, 20).select("transaction_id", "user_id").collect()
        b = generator.transaction_batch(spark, 20).select("transaction_id", "user_id").collect()
        assert a == b


class TestIngest:
    def test_partitioned_file_sink_exactly_once(self, spark, tmp_path, tx_json_dir):
        out = str(tmp_path / "lake")
        ckpt = str(tmp_path / "ckpt")
        stream = _file_stream(spark, tx_json_dir)
        query = ingest_stream_to_lake(stream, out, ckpt, available_now=True)
        query.awaitTermination(120)
        first = spark.read.parquet(out)
        assert first.count() == 200
        assert {"year", "month", "day"} <= set(first.columns)
        # restart with same checkpoint: no new input ⇒ no duplicates
        query2 = ingest_stream_to_lake(_file_stream(spark, tx_json_dir), out, ckpt)
        query2.awaitTermination(120)
        assert spark.read.parquet(out).count() == 200

    def test_parse_kafka_json_shape(self, spark, tmp_path):
        """from_json over kafka-shaped (key, value) rows (#3/#56)."""
        payload = generator.transaction_batch(spark, 5)
        kafka_shaped = payload.select(
            F.to_json(F.struct(*payload.columns)).cast("binary").alias("value")
        )
        parsed = parse_kafka_json(kafka_shaped, "transaction_stream")
        rows = parsed.collect()
        assert len(rows) == 5
        assert rows[0]["transaction_id"].startswith("tx_")
        assert parsed.schema["amount"].dataType.simpleString() == "double"

    def test_unknown_topic_schema(self):
        with pytest.raises(KeyError):
            json_feed_schema("nope")


class TestDeadLetters:
    def _wire(self, spark, values):
        return spark.createDataFrame([(v,) for v in values], "value string")

    def test_split_semantics(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.streaming import (
            split_dead_letters,
        )

        good_json = (
            '{"transaction_id": "tx_1", "user_id": 7, "amount": 3.5,'
            ' "currency": "EUR", "timestamp": "2026-01-01T00:00:00Z",'
            ' "status": "completed"}'
        )
        missing_id = good_json.replace('"transaction_id": "tx_1", ', "")
        raw = self._wire(
            spark, [good_json, "{not json at all", "garbage", missing_id]
        )
        good, dead = split_dead_letters(
            raw, "transaction_stream", required=("transaction_id",)
        )
        good_rows = good.collect()
        dead_rows = {r.raw_value: r.reason for r in dead.collect()}
        assert [r.transaction_id for r in good_rows] == ["tx_1"]
        assert dead_rows["{not json at all"] == "malformed_json"
        assert dead_rows["garbage"] == "malformed_json"
        assert dead_rows[missing_id] == "missing_required:transaction_id"
        assert all(r.topic == "transaction_stream" for r in dead.collect())

    def test_streaming_dlq_end_to_end(self, spark, tmp_path):
        """foreachBatch quarantine: good rows land partitioned in the
        lake, rejects land in the DLQ dir with reasons — one source read."""
        from construction_data_lake_et_data_warehouse_tp3_spark.streaming import (
            ingest_with_dlq,
        )

        topic_dir = str(tmp_path / "topic")
        good = generator.transaction_batch(spark, 20)
        lines = [r["value"] for r in good.select(
            F.to_json(F.struct(*good.columns)).alias("value")
        ).collect()]
        lines += ["BROKEN{{{", '{"user_id": 1}']  # malformed + missing id
        import os

        os.makedirs(topic_dir)
        with open(os.path.join(topic_dir, "part-0.txt"), "w") as fh:
            fh.write("\n".join(lines))

        stream = spark.readStream.text(topic_dir).withColumnRenamed("value", "value")
        query = ingest_with_dlq(
            stream,
            "transaction_stream",
            str(tmp_path / "lake"),
            str(tmp_path / "dlq"),
            str(tmp_path / "ckpt"),
            required=("transaction_id",),
        )
        query.awaitTermination(120)
        lake = spark.read.parquet(str(tmp_path / "lake"))
        dlq = spark.read.parquet(str(tmp_path / "dlq"))
        assert lake.count() == 20
        assert {"year", "month", "day"} <= set(lake.columns)
        reasons = sorted(r.reason for r in dlq.collect())
        assert reasons == ["malformed_json", "missing_required:transaction_id"]


class TestStreamingAggregation:
    def test_unwindowed_update_mode(self, spark, tmp_path, tx_json_dir):
        """#66: running aggregate, update output — reference ksqlDB table
        semantics (unwindowed, no watermark)."""
        stream = _file_stream(spark, tx_json_dir)
        agg = streaming_user_totals(stream)
        query = (
            agg.writeStream.format("memory")
            .queryName("user_totals")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        result = spark.sql("SELECT * FROM user_totals")
        batch = (
            spark.read.schema(json_feed_schema("transaction_stream"))
            .json(tx_json_dir)
            .groupBy("user_id")
            .count()
        )
        assert result.count() == batch.count()
        assert result.agg(F.sum("transaction_count")).collect()[0][0] == 200

    def test_windowed_with_watermark(self, spark, tmp_path):
        """Beyond-reference event-time window + watermark (bounded state)."""
        import datetime

        base = datetime.datetime(2026, 1, 1, 12, 0, 0)
        rows = [
            (base + datetime.timedelta(seconds=30 * k), k % 3 + 1, 10.0)
            for k in range(12)
        ]
        src_dir = str(tmp_path / "events")
        spark.createDataFrame(
            rows, "event_time timestamp, user_id long, amount double"
        ).write.mode("overwrite").json(src_dir)
        stream = (
            spark.readStream.schema("event_time timestamp, user_id long, amount double")
            .json(src_dir)
        )
        query = (
            windowed_user_totals(stream)
            .writeStream.format("memory")
            .queryName("windowed")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckw"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        result = spark.sql("SELECT * FROM windowed")
        assert "window" in result.columns


class TestWarehouseSink:
    def test_foreach_batch_merge_idempotent(self, spark, tmp_path, tx_json_dir):
        table = ParquetTable(spark, str(tmp_path / "fact"))
        stream = _file_stream(spark, tx_json_dir).groupBy("user_id").agg(
            F.count("*").alias("transaction_count")
        )
        query = stream_to_warehouse(
            stream,
            table,
            keys=("user_id", "snapshot_date", "snapshot_version"),
            checkpoint=str(tmp_path / "ck1"),
        )
        query.awaitTermination(120)
        n1 = table.read().count()
        assert n1 > 0
        assert {"snapshot_date", "snapshot_version"} <= set(table.read().columns)
        # replay from a fresh checkpoint: same keys ⇒ same row count
        query2 = stream_to_warehouse(
            _file_stream(spark, tx_json_dir)
            .groupBy("user_id")
            .agg(F.count("*").alias("transaction_count")),
            table,
            keys=("user_id", "snapshot_date", "snapshot_version"),
            checkpoint=str(tmp_path / "ck2"),
        )
        query2.awaitTermination(120)
        assert table.read().count() == n1
