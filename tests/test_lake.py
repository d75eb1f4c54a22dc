"""Lake layer semantics tests (SURVEY §5 item 3): catalog lifecycle,
version auto-increment, count-based retention, metadata stats — asserted
against the reference behaviors cited in SURVEY §2.11."""

from __future__ import annotations

from datetime import datetime

import pytest

from construction_data_lake_et_data_warehouse_tp3_spark.lake import (
    DataLakeWriter,
    FeedCatalog,
    FeedConfig,
    FeedType,
    PartitioningType,
    StorageMode,
    apply_stream_retention,
    apply_version_retention,
)


@pytest.fixture
def catalog(tmp_path):
    return FeedCatalog(str(tmp_path / "lake"))


def stream_cfg(name="tx_stream"):
    return FeedConfig(
        feed_name=name,
        feed_type=FeedType.STREAM,
        source="transaction_stream",
        partitioning=PartitioningType.DATE,
        storage_mode=StorageMode.APPEND,
    )


def table_cfg(name="user_summary", keep=3):
    return FeedConfig(
        feed_name=name,
        feed_type=FeedType.TABLE,
        source="user_transaction_summary",
        partitioning=PartitioningType.VERSION,
        storage_mode=StorageMode.OVERWRITE,
        keep_versions=keep,
    )


class TestCatalog:
    def test_add_list_get(self, catalog):
        catalog.add(stream_cfg())
        catalog.add(table_cfg())
        names = [c.feed_name for c in catalog.list()]
        assert names == ["tx_stream", "user_summary"]  # sorted (#72)
        assert catalog.get("tx_stream").feed_type is FeedType.STREAM

    def test_add_duplicate_refused(self, catalog):
        catalog.add(stream_cfg())
        with pytest.raises(ValueError, match="already exists"):
            catalog.add(stream_cfg())

    def test_enum_validation(self, catalog):
        with pytest.raises(ValueError):
            catalog.add(
                FeedConfig(feed_name="bad", feed_type="nope", source="x")
            )

    def test_update_and_disable(self, catalog):
        catalog.add(stream_cfg())
        catalog.disable("tx_stream")
        assert not catalog.get("tx_stream").enabled
        updated = catalog.update("tx_stream", retention_days=30)
        assert updated.retention_days == 30
        with pytest.raises(ValueError, match="unknown feed field"):
            catalog.update("tx_stream", nonsense=1)

    def test_archive_restore_flips(self, catalog):
        catalog.add(stream_cfg())
        archived = catalog.archive("tx_stream")
        assert archived.archived_at and not archived.enabled
        assert [c.feed_name for c in catalog.list()] == []
        assert [c.feed_name for c in catalog.list(archived=True)] == ["tx_stream"]
        restored = catalog.restore("tx_stream")
        assert restored.enabled and restored.restored_at and restored.archived_at is None
        assert [c.feed_name for c in catalog.list()] == ["tx_stream"]

    def test_delete_requires_confirm_and_keeps_data(self, catalog, tmp_path):
        config = catalog.add(stream_cfg())
        data_dir = catalog.feed_data_path(config)
        with pytest.raises(ValueError, match="confirm"):
            catalog.delete("tx_stream")
        catalog.delete("tx_stream", confirm=True)
        import os

        assert os.path.isdir(data_dir)  # data retained (manage_feeds.py:262)

    def test_sync_from_config_idempotent(self, catalog):
        configs = [stream_cfg(), table_cfg()]
        assert catalog.sync_from_config(configs) == ["tx_stream", "user_summary"]
        assert catalog.sync_from_config(configs) == []


class TestWriter:
    def test_stream_export_partitions_and_metadata(self, spark, catalog):
        config = catalog.add(stream_cfg())
        writer = DataLakeWriter(spark, catalog)
        df = spark.range(10).selectExpr("id", "id * 2.0 AS amount")
        result = writer.export_stream(df, config)
        assert result["records"] == 10
        back = writer.read_stream_feed(config)
        assert back.count() == 10
        assert {"year", "month", "day"} <= set(back.columns)
        # append again → metadata merges the same partition entry (#25)
        writer.export_stream(df, config)
        assert writer.read_stream_feed(config).count() == 20

    def test_disabled_and_empty_guards(self, spark, catalog):
        config = catalog.add(stream_cfg())
        writer = DataLakeWriter(spark, catalog)
        catalog.disable("tx_stream")
        assert writer.export_stream(
            spark.range(1), catalog.get("tx_stream")
        ) == {"skipped": "disabled"}
        assert writer.export_stream(spark.range(0), config) == {"skipped": "empty"}

    def test_version_autoincrement_and_retention(self, spark, catalog):
        config = catalog.add(table_cfg(keep=3))
        writer = DataLakeWriter(spark, catalog)
        df = spark.range(5).selectExpr("id", "id * 1.5 AS v")
        versions = [writer.export_table(df, config)["version"] for _ in range(5)]
        assert versions == [1, 2, 3, 4, 5]
        from construction_data_lake_et_data_warehouse_tp3_spark.lake.retention import (
            list_versions,
        )

        kept = [n for n, _ in list_versions(catalog.feed_data_path(config))]
        assert kept == [3, 4, 5]  # newest keep_versions survive
        assert writer.read_table_feed(config).count() == 5  # latest readable


class TestRetention:
    def test_stream_retention_dry_run_and_delete(self, spark, catalog):
        config = catalog.add(stream_cfg())
        writer = DataLakeWriter(spark, catalog)
        df = spark.range(3).selectExpr("id")
        from datetime import date

        writer.export_stream(df, config, partition_date=date(2020, 1, 1))
        writer.export_stream(df, config, partition_date=date(2020, 6, 1))
        writer.export_stream(df, config)  # today
        path = catalog.feed_data_path(config)
        preview = apply_stream_retention(path, retention_days=365, dry_run=True)
        assert len(preview) == 2
        deleted = apply_stream_retention(path, retention_days=365)
        assert sorted(deleted) == sorted(preview)
        assert writer.read_stream_feed(config).count() == 3  # only today's rows

    def test_version_retention_dry_run(self, tmp_path):
        import os

        feed = tmp_path / "feed"
        for n in range(1, 6):
            os.makedirs(feed / f"version=v{n}")
        preview = apply_version_retention(str(feed), keep_versions=2, dry_run=True)
        assert len(preview) == 3
        apply_version_retention(str(feed), keep_versions=2)
        assert sorted(os.listdir(feed)) == ["version=v4", "version=v5"]
