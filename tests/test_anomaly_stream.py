"""Streaming anomaly monitor (streaming.anomaly_stream): baseline parity
with the batch z-score discipline, exactly-once alerts across replays,
and batch/stream scoring agreement."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.streaming import (
    StreamingAnomalyMonitor,
    train_baseline,
)


def _history(spark):
    # 200 ordinary amounts around 100.00 plus structure for exact asserts
    rows = [(i, 100.0 + (i % 9)) for i in range(200)]
    return spark.createDataFrame(rows, "transaction_id long, amount double")


class TestStreamingAnomalyMonitor:
    def test_baseline_matches_manual_stats(self, spark):
        mu, sigma = train_baseline(_history(spark))
        cents = [round((100.0 + (i % 9)) * 100) for i in range(200)]
        want_mu = sum(cents) / len(cents)
        want_sigma = math.sqrt(
            sum((c - want_mu) ** 2 for c in sorted(cents)) / len(cents)
        )
        assert mu == want_mu
        assert abs(sigma - want_sigma) < 1e-9

    def test_stream_alerts_exactly_once_and_match_batch_score(self, spark, tmp_path):
        mu, sigma = train_baseline(_history(spark))
        monitor = StreamingAnomalyMonitor(
            spark, str(tmp_path / "store"), mu, sigma, threshold_sigmas=3.0
        )
        live_rows = [(1000, 101.0), (1001, 5000.0), (1002, 99.5), (1003, -400.0)]
        live = spark.createDataFrame(
            live_rows, "transaction_id long, amount double"
        )
        topic = str(tmp_path / "topic")
        live.coalesce(2).write.mode("overwrite").json(topic)

        stream = spark.readStream.schema(live.schema).json(topic)
        monitor.attach(stream, str(tmp_path / "ckpt")).awaitTermination(120)
        alerts = {r.transaction_id for r in monitor.alerts.read().collect()}
        assert alerts == {1001, 1003}  # the two far-outliers

        # replay with a fresh checkpoint: MERGE on id absorbs redelivery
        stream2 = spark.readStream.schema(live.schema).json(topic)
        monitor.attach(stream2, str(tmp_path / "ckpt2")).awaitTermination(120)
        assert monitor.alert_count() == 2

        # stream scoring is the batch score() verbatim
        batch_flags = {
            r.transaction_id
            for r in monitor.score(live).where("is_anomaly").collect()
        }
        assert batch_flags == alerts

    def test_degenerate_baseline_rejected(self, spark, tmp_path):
        import pytest

        with pytest.raises(ValueError, match="sigma"):
            StreamingAnomalyMonitor(spark, str(tmp_path / "s"), 0.0, 0.0)
