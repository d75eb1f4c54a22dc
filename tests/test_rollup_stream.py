"""Continuous aggregate (streaming/rollup_stream.py): incremental folds
must equal the batch hour rollup exactly, replays must not double-count
(both before and after compaction), and compact() must preserve totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.streaming.rollup_stream import (
    StreamingRollup,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").where(
        F.col("user_id") < 40
    )


def _batch_truth(spark):
    return sorted(
        tuple(r)
        for r in _events(spark)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("total_cents"),
        )
        .collect()
    )


def _state(roll):
    return sorted(tuple(r) for r in roll.rollup().collect())


class TestStreamingRollup:
    def test_incremental_equals_batch_rollup(self, spark, tmp_path):
        ev = _events(spark)
        cut = F.lit("2024-01-16 00:00:00").cast(ev.schema["ts"].dataType)
        roll = StreamingRollup(spark, str(tmp_path))
        assert roll.process_batch(ev.where(F.col("ts") <= cut), 0) > 0
        assert roll.process_batch(ev.where(F.col("ts") > cut), 1) > 0
        assert _state(roll) == _batch_truth(spark)

    def test_replay_never_double_counts(self, spark, tmp_path):
        ev = _events(spark)
        roll = StreamingRollup(spark, str(tmp_path))
        roll.process_batch(ev, 0)
        truth = _state(roll)
        assert roll.process_batch(ev, 0) == 0  # ledger short-circuit
        assert _state(roll) == truth
        # even a replay AFTER compaction folded the partials away
        roll.compact()
        assert roll.process_batch(ev, 0) == 0
        assert _state(roll) == truth == _batch_truth(spark)

    def test_compact_preserves_totals_and_bounds_rows(self, spark, tmp_path):
        ev = _events(spark)
        cut = F.lit("2024-01-16 00:00:00").cast(ev.schema["ts"].dataType)
        roll = StreamingRollup(spark, str(tmp_path))
        roll.process_batch(ev.where(F.col("ts") <= cut), 0)
        roll.process_batch(ev.where(F.col("ts") > cut), 1)
        before = _state(roll)
        n_buckets = roll.compact()
        assert _state(roll) == before
        assert roll.partials.read().count() == n_buckets  # 1 row/bucket
