"""Time-travel reads, event-time partitioning opt-in, warehouse schema
enforcement, and streaming approx-distinct (SURVEY §7 risks 3/5 + §1.3
schema boundary)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.lake import (
    DataLakeWriter,
    FeedCatalog,
    FeedConfig,
    FeedType,
    PartitioningType,
    StorageMode,
)
from construction_data_lake_et_data_warehouse_tp3_spark.warehouse import (
    ParquetTable,
    merge_into,
)
from construction_data_lake_et_data_warehouse_tp3_spark.warehouse.merge import (
    SchemaMismatchError,
)


@pytest.fixture
def catalog(tmp_path):
    return FeedCatalog(str(tmp_path / "lake"))


class TestTimeTravel:
    def test_read_as_of_picks_right_version(self, spark, catalog):
        config = catalog.add(
            FeedConfig(
                feed_name="snap",
                feed_type=FeedType.TABLE,
                source="s",
                partitioning=PartitioningType.VERSION,
                storage_mode=StorageMode.OVERWRITE,
                keep_versions=10,
            )
        )
        writer = DataLakeWriter(spark, catalog)
        import time

        marks = []
        for n in (10, 20, 30):
            writer.export_table(spark.range(n), config)
            marks.append(datetime.datetime.now(datetime.timezone.utc).isoformat())
            time.sleep(0.05)

        assert writer.read_table_as_of(config, marks[0]).count() == 10
        assert writer.read_table_as_of(config, marks[1]).count() == 20
        assert writer.read_table_as_of(config, marks[2]).count() == 30
        assert writer.read_table_feed(config).count() == 30  # latest
        with pytest.raises(LookupError):
            writer.read_table_as_of(config, "1999-01-01T00:00:00+00:00")

    def test_as_of_skips_retained_away_versions(self, spark, catalog):
        config = catalog.add(
            FeedConfig(
                feed_name="snap2",
                feed_type=FeedType.TABLE,
                source="s",
                partitioning=PartitioningType.VERSION,
                storage_mode=StorageMode.OVERWRITE,
                keep_versions=2,
            )
        )
        writer = DataLakeWriter(spark, catalog)
        for n in (10, 20, 30):
            writer.export_table(spark.range(n), config)
        # v1 purged by keep_versions=2; asking for "now" resolves to v3,
        # asking for before-v1 raises rather than serving deleted data
        now = datetime.datetime.now(datetime.timezone.utc).isoformat()
        assert writer.read_table_as_of(config, now).count() == 30


class TestEventTimePartitioning:
    def test_event_time_fans_out_partitions(self, spark, catalog):
        config = catalog.add(
            FeedConfig(
                feed_name="ev",
                feed_type=FeedType.STREAM,
                source="s",
                partitioning=PartitioningType.DATE,
                storage_mode=StorageMode.APPEND,
            )
        )
        writer = DataLakeWriter(spark, catalog)
        df = spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1)), (2, datetime.datetime(2024, 2, 15))],
            "id long, ts timestamp",
        )
        writer.export_stream(df, config, event_time_col="ts")
        back = writer.read_stream_feed(config)
        days = {(r["year"], r["month"], r["day"]) for r in back.collect()}
        assert days == {(2024, 1, 1), (2024, 2, 15)}
        # processing-time default lands everything on one (today) partition
        writer.export_stream(df.select("id", "ts"), config)
        back2 = writer.read_stream_feed(config)
        assert back2.count() == 4


class TestSchemaEnforcement:
    def test_missing_key_raises(self, spark, tmp_path):
        table = ParquetTable(spark, str(tmp_path / "t"))
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        with pytest.raises(SchemaMismatchError, match="merge key"):
            merge_into(table, df, ["nope"])

    def test_dropped_column_raises(self, spark, tmp_path):
        table = ParquetTable(spark, str(tmp_path / "t"))
        merge_into(table, spark.createDataFrame([(1, "a", 5)], "id long, v string, extra int"), ["id"])
        with pytest.raises(SchemaMismatchError, match="missing target columns"):
            merge_into(table, spark.createDataFrame([(2, "b")], "id long, v string"), ["id"])

    def test_added_column_backfills_null(self, spark, tmp_path):
        table = ParquetTable(spark, str(tmp_path / "t"))
        merge_into(table, spark.createDataFrame([(1, "a")], "id long, v string"), ["id"])
        merge_into(
            table,
            spark.createDataFrame([(2, "b", 7)], "id long, v string, extra int"),
            ["id"],
        )
        rows = {r["id"]: r["extra"] for r in table.read().collect()}
        assert rows == {1: None, 2: 7}


class TestStreamingApproxDistinct:
    def test_streaming_distinct_aggregation(self, spark, tmp_path):
        from construction_data_lake_et_data_warehouse_tp3_spark.sources.generator import (
            transaction_batch,
        )
        from construction_data_lake_et_data_warehouse_tp3_spark.streaming import (
            json_feed_schema,
        )
        from construction_data_lake_et_data_warehouse_tp3_spark.streaming.ingest import (
            streaming_user_totals_distinct,
        )

        src = str(tmp_path / "topic")
        transaction_batch(spark, 300).write.mode("overwrite").json(src)
        stream = spark.readStream.schema(json_feed_schema("transaction_stream")).json(src)
        query = (
            streaming_user_totals_distinct(stream)
            .writeStream.format("memory")
            .queryName("distinct_totals")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        result = spark.sql("SELECT * FROM distinct_totals").collect()
        assert {r["currency"] for r in result} == {"EUR", "USD", "GBP"}
        assert all(r["approx_unique_users"] > 0 for r in result)
