"""Streaming KMV sketch (streaming/sketch_stream.py): the incremental
fold must equal the one-shot batch sketch bit-for-bit, replays must be
no-ops BY ALGEBRA (no ledger exists to save them), and new groups must
appear without disturbing existing ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.operators.sketches import (
    kmv_distinct_users,
)
from construction_data_lake_et_data_warehouse_tp3_spark.streaming.sketch_stream import (
    StreamingCardinality,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _state(card):
    return sorted(tuple(r) for r in card.estimates().collect())


class TestStreamingCardinality:
    def test_incremental_equals_batch_sketch(self, spark, tmp_path):
        ev = _events(spark)
        card = StreamingCardinality(spark, str(tmp_path))
        card.process_batch(ev.where("user_id < 8"), 0)
        card.process_batch(ev.where("user_id >= 8"), 1)
        batch = sorted(
            (r.event_type, r.est_distinct)
            for r in kmv_distinct_users(spark, SF_DIR).collect()
        )
        assert _state(card) == batch

    def test_replay_is_noop_by_idempotence(self, spark, tmp_path):
        ev = _events(spark)
        card = StreamingCardinality(spark, str(tmp_path))
        card.process_batch(ev, 0)
        truth = _state(card)
        card.process_batch(ev, 0)  # at-least-once replay, no ledger
        assert _state(card) == truth

    def test_new_group_joins_without_disturbing_others(self, spark, tmp_path):
        ev = _events(spark)
        card = StreamingCardinality(spark, str(tmp_path))
        card.process_batch(ev.where("event_type <> 'click'"), 0)
        before = dict(_state(card))
        card.process_batch(ev.where("event_type = 'click'"), 1)
        after = dict(_state(card))
        assert "click" in after and "click" not in before
        assert all(after[g] == v for g, v in before.items())

    def test_attach_drains_a_real_stream(self, spark, tmp_path):
        ev = _events(spark).select("user_id", "event_type")
        src = str(tmp_path / "src")
        ev.write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        card = StreamingCardinality(spark, str(tmp_path / "store"))
        q = card.attach(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        batch = sorted(
            (r.event_type, r.est_distinct)
            for r in kmv_distinct_users(spark, SF_DIR).collect()
        )
        assert _state(card) == batch
