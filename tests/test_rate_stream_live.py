"""Live rate-source streaming test: the true continuous path (processing-
time trigger over the rate source), not the file-source replay — proves
the generator stream sustains well above the reference's 2,000 msg/s
stress figure (BASELINE.md)."""

from __future__ import annotations

import time

from construction_data_lake_et_data_warehouse_tp3_spark.sources.generator import (
    transaction_rate_stream,
)
from construction_data_lake_et_data_warehouse_tp3_spark.streaming import (
    ingest_stream_to_lake,
)


def test_rate_stream_sustains_reference_stress_rate(spark, tmp_path):
    stream = transaction_rate_stream(spark, rows_per_second=5_000)
    out, ckpt = str(tmp_path / "lake"), str(tmp_path / "ckpt")
    query = ingest_stream_to_lake(
        stream, out, ckpt, available_now=False, processing_time="1 second"
    )
    try:
        time.sleep(8)
    finally:
        query.stop()
        query.awaitTermination(60)
    ingested = spark.read.parquet(out)
    n = ingested.count()
    # 8s at 5k rows/s nominal; require >2k/s sustained after startup slack
    assert n > 2_000 * 8 / 2, f"only {n} rows ingested"
    sample = ingested.limit(1).collect()[0]
    assert sample["transaction_id"].startswith("tx_")
    assert {"year", "month", "day"} <= set(ingested.columns)
