"""Kafka-leg integration tests without a broker (VERDICT r1 §Missing #1).

Two halves, which together pin the whole path the reference runs through
kafka-python (kafka_consumer_datalake.py:21-76):

1. option wiring — kafka_source is invoked against a recording
   DataStreamReader and must configure format=kafka, bootstrap servers,
   subscribe list, and earliest replay exactly;
2. the downstream graph — producer payloads are serialized to the wire
   (JSON bytes, keys, offsets — encode_wire_records), replayed through a
   streaming source with the connector's exact output schema
   (kafka_wire_twin), and driven through the IDENTICAL
   parse_kafka_json → ingest_stream_to_lake graph into partitioned
   parquet; the landed rows must round-trip the original payloads.
"""

from __future__ import annotations

import pytest

from construction_data_lake_et_data_warehouse_tp3_spark.sources.generator import (
    transaction_batch,
)
from construction_data_lake_et_data_warehouse_tp3_spark.streaming.ingest import (
    KAFKA_WIRE_SCHEMA,
    encode_wire_records,
    ingest_stream_to_lake,
    kafka_source,
    kafka_wire_twin,
    parse_kafka_json,
)


class _RecordingReader:
    """Stands in for spark.readStream: records every format/option call,
    returns a sentinel from load()."""

    def __init__(self):
        self.calls = {}
        self.loaded = False

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def option(self, key, value):
        self.calls[key] = value
        return self

    def load(self):
        self.loaded = True
        return "sentinel-df"


def test_kafka_source_option_wiring(monkeypatch):
    class FakeSpark:
        readStream = _RecordingReader()

    fake = FakeSpark()
    out = kafka_source(fake, "transaction_stream,transaction_flattened", "broker:9093")
    assert out == "sentinel-df"
    assert fake.readStream.loaded
    assert fake.readStream.calls == {
        "format": "kafka",
        "kafka.bootstrap.servers": "broker:9093",
        "subscribe": "transaction_stream,transaction_flattened",
        "startingOffsets": "earliest",
    }


def test_wire_records_have_connector_schema(spark):
    batch = transaction_batch(spark, 10)
    wire = encode_wire_records(batch, "transaction_stream", key_col="transaction_id")
    # literals make some fields non-nullable; the wire contract is names+types
    assert [(f.name, f.dataType) for f in wire.schema] == [
        (f.name, f.dataType) for f in KAFKA_WIRE_SCHEMA
    ]
    rows = wire.orderBy("offset").collect()
    assert [r.offset for r in rows] == list(range(10))
    assert all(r.topic == "transaction_stream" for r in rows)
    assert rows[0].value.decode().startswith("{")  # JSON bytes on the wire


def test_wire_replay_through_identical_graph(spark, tmp_path):
    batch = transaction_batch(spark, 50)
    records_dir = str(tmp_path / "wire")
    out_dir = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    encode_wire_records(batch, "transaction_stream", key_col="transaction_id").write.parquet(
        records_dir
    )

    raw = kafka_wire_twin(spark, records_dir)
    assert raw.isStreaming and raw.schema == KAFKA_WIRE_SCHEMA
    parsed = parse_kafka_json(raw, "transaction_stream")
    query = ingest_stream_to_lake(parsed, out_dir, ckpt, available_now=True)
    query.awaitTermination(120)

    landed = spark.read.parquet(out_dir)
    want = {
        (r.transaction_id, r.user_id, r.amount, r.currency, r.status)
        for r in batch.collect()
    }
    got = {
        (r.transaction_id, r.user_id, r.amount, r.currency, r.status)
        for r in landed.collect()
    }
    assert got == want
    assert {"year", "month", "day"} <= set(landed.columns)  # partitioned landing
