"""Bucketed co-located joins (shuffle elimination) and the golden
end-to-end pipeline (SURVEY §5 item 2): generator → lake → aggregate →
warehouse MERGE → replay idempotency, through the engine's own layers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import load_table
from construction_data_lake_et_data_warehouse_tp3_spark.warehouse.bucketing import (
    bucketed_join,
    exchanges_in_plan,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


class TestBucketing:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        try:
            orders = load_table(spark, SF_DIR, "orders")
            lineitem = load_table(spark, SF_DIR, "lineitem")
            write_bucketed(orders, "b_orders", "o_orderkey", 8)
            write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8)

            joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
            n_exchanges = exchanges_in_plan(joined)
            assert n_exchanges == 0, f"bucketed join should not shuffle, saw {n_exchanges}"

            # same join on the raw (unbucketed) tables shuffles both sides
            raw = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            assert exchanges_in_plan(raw) >= 2

            # and the result matches the raw join
            assert joined.count() == raw.count()
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


class TestGoldenPipeline:
    def test_generator_to_warehouse_end_to_end(self, spark, tmp_path):
        """ingest → lake (date-partitioned) → read-back → aggregate →
        MERGE → replay: counts stable, values match a direct aggregation."""
        from construction_data_lake_et_data_warehouse_tp3_spark.lake import (
            DataLakeWriter,
            FeedCatalog,
            FeedConfig,
            FeedType,
            PartitioningType,
            StorageMode,
        )
        from construction_data_lake_et_data_warehouse_tp3_spark.sources.generator import (
            transaction_batch,
        )
        from construction_data_lake_et_data_warehouse_tp3_spark.warehouse import (
            ParquetTable,
            merge_into,
        )

        catalog = FeedCatalog(str(tmp_path / "lake"))
        config = catalog.add(
            FeedConfig(
                feed_name="transaction_stream",
                feed_type=FeedType.STREAM,
                source="kafka:transaction_stream",
                partitioning=PartitioningType.DATE,
                storage_mode=StorageMode.APPEND,
            )
        )
        writer = DataLakeWriter(spark, catalog)

        batch = transaction_batch(spark, 5_000)
        writer.export_stream(batch, config)

        lake_view = writer.read_stream_feed(config)
        assert lake_view.count() == 5_000

        summary = lake_view.groupBy("currency").agg(
            F.count("*").alias("n_tx"),
            F.round(F.sum("amount"), 2).alias("total"),
        )
        fact = ParquetTable(spark, str(tmp_path / "wh" / "fact_currency"))
        merge_into(fact, summary, ["currency"])
        state1 = {r["currency"]: (r["n_tx"], r["total"]) for r in fact.read().collect()}
        assert sum(v[0] for v in state1.values()) == 5_000

        # replay the same merge → identical warehouse state
        merge_into(fact, summary, ["currency"])
        state2 = {r["currency"]: (r["n_tx"], r["total"]) for r in fact.read().collect()}
        assert state1 == state2

        # direct aggregation over the generator matches the via-lake path
        direct = {
            r["currency"]: r["n"]
            for r in batch.groupBy("currency").agg(F.count("*").alias("n")).collect()
        }
        assert {k: v[0] for k, v in state1.items()} == direct
