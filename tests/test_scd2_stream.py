"""Streaming SCD2 maintainer: the incremental fold must reproduce the
batch operator's history exactly (same semantics, different execution),
replays must be no-ops, and cross-batch late rows must be refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.operators.statistics import (
    scd2_user_state_history,
)
from construction_data_lake_et_data_warehouse_tp3_spark.streaming.scd2_stream import (
    StreamingScd2,
)

SF_DIR = "/root/testdata/sf0.001"
N_USERS = 12  # subset keeps the diff fast; semantics don't depend on size


def _events_subset(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id") < N_USERS)
        .select("user_id", "ts", "event_id", F.col("event_type").alias("state"))
    )


def _batch_truth(spark):
    return [
        tuple(r)
        for r in sorted(
            scd2_user_state_history(spark, SF_DIR)
            .where(F.col("user_id") < N_USERS)
            .collect()
        )
    ]


def _history(scd2):
    return [tuple(r) for r in sorted(scd2.history().collect())]


class TestStreamingScd2:
    def test_single_batch_equals_batch_operator(self, spark, tmp_path):
        scd2 = StreamingScd2(spark, str(tmp_path), seq_col="event_id")
        scd2.process_batch(_events_subset(spark))
        assert _history(scd2) == _batch_truth(spark)

    def test_incremental_batches_equal_batch_operator(self, spark, tmp_path):
        """Split the stream at its median timestamp: folding the two
        halves sequentially must land the identical history, including
        the close-the-open-row transition at the boundary."""
        ev = _events_subset(spark)
        cut = F.lit("2024-01-16 00:00:00").cast(ev.schema["ts"].dataType)
        scd2 = StreamingScd2(spark, str(tmp_path), seq_col="event_id")
        n1 = scd2.process_batch(ev.where(F.col("ts") <= cut))
        n2 = scd2.process_batch(ev.where(F.col("ts") > cut))
        assert n1 > 0 and n2 > 0
        assert _history(scd2) == _batch_truth(spark)

    def test_replay_is_noop(self, spark, tmp_path):
        ev = _events_subset(spark)
        scd2 = StreamingScd2(spark, str(tmp_path), seq_col="event_id")
        scd2.process_batch(ev)
        before = _history(scd2)
        assert scd2.process_batch(ev) == 0  # full at-least-once replay
        assert _history(scd2) == before

    def test_late_rows_refused_and_noop_change_dropped(self, spark, tmp_path):
        scd2 = StreamingScd2(spark, str(tmp_path), seq_col="event_id")
        first = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", 1, "view")],
            "user_id long, ts string, event_id long, state string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        scd2.process_batch(first)
        late_and_noop = spark.createDataFrame(
            [
                (1, "2024-01-01 09:00:00", 2, "click"),  # late: before open row
                (1, "2024-01-01 11:00:00", 3, "view"),  # no-op: restates state
            ],
            "user_id long, ts string, event_id long, state string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        assert scd2.process_batch(late_and_noop) == 0
        hist = _history(scd2)
        assert len(hist) == 1 and hist[0][4] is None  # still one open row

    def test_real_transition_closes_open_row(self, spark, tmp_path):
        scd2 = StreamingScd2(spark, str(tmp_path), seq_col="event_id")
        frames = [
            [(7, "2024-01-01 10:00:00", 1, "view")],
            [(7, "2024-01-02 10:00:00", 2, "purchase")],
        ]
        for rows in frames:
            df = spark.createDataFrame(
                rows, "user_id long, ts string, event_id long, state string"
            ).withColumn("ts", F.col("ts").cast("timestamp"))
            scd2.process_batch(df)
        hist = sorted(scd2.history().collect(), key=lambda r: r["version"])
        assert [r["state"] for r in hist] == ["view", "purchase"]
        assert hist[0]["valid_to"] == hist[1]["valid_from"]
        assert (hist[0]["is_current"], hist[1]["is_current"]) == (False, True)
        assert (hist[0]["version"], hist[1]["version"]) == (1, 2)
