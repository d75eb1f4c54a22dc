"""Continuous curation (streaming quality gate + exact dedup):
cross-batch survivorship, replay idempotence, end-to-end attach."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from construction_data_lake_et_data_warehouse_tp3_spark.streaming.curation_stream import (
    StreamingCurator,
)

GOOD_A = "the quick brown fox jumps over the lazy dog and runs far away home"
GOOD_B = "a market of traders and the sellers of goods in a town square meet"
LOW_QUALITY = "xy"  # below MIN_WORDS and no stopword


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "curation_store")


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestStreamingCuration:
    def test_gate_and_within_batch_dedup(self, spark, store):
        cur = StreamingCurator(spark, store)
        kept = cur.process_batch(
            _batch(spark, [(1, GOOD_A), (2, GOOD_A), (3, LOW_QUALITY), (4, GOOD_B)])
        )
        # dup of A (doc 2) and the low-quality doc are dropped
        assert kept == 2
        assert {r.doc_id for r in cur.kept_docs().collect()} == {1, 4}

    def test_cross_batch_dedup_first_wins(self, spark, store):
        cur = StreamingCurator(spark, store)
        cur.process_batch(_batch(spark, [(1, GOOD_A)]))
        kept = cur.process_batch(_batch(spark, [(5, GOOD_A), (6, GOOD_B)]))
        assert kept == 1  # doc 5 is a cross-batch duplicate of doc 1
        assert {r.doc_id for r in cur.kept_docs().collect()} == {1, 6}
        owners = {r.h: r.doc_id for r in cur.content_hashes().collect()}
        assert len(owners) == 2

    def test_replay_is_idempotent(self, spark, store):
        cur = StreamingCurator(spark, store)
        batch = _batch(spark, [(1, GOOD_A), (2, GOOD_A), (4, GOOD_B)])
        first = cur.process_batch(batch)
        replay = cur.process_batch(batch)  # at-least-once redelivery
        assert first == replay == 2  # survivors pass again, dups stay dropped
        assert cur.kept_docs().count() == 2
        assert cur.content_hashes().count() == 2

    def test_streaming_attach_end_to_end(self, spark, store):
        root = tempfile.mkdtemp(prefix="tp3_curation_stream_")
        try:
            src = f"{root}/src"
            _batch(
                spark, [(1, GOOD_A), (2, GOOD_A), (3, LOW_QUALITY), (4, GOOD_B)]
            ).write.mode("overwrite").json(src)
            stream = spark.readStream.schema("doc_id long, text string").json(src)
            cur = StreamingCurator(spark, store)
            q = cur.attach(stream, f"{root}/ckpt")
            q.awaitTermination(120)
            assert {r.doc_id for r in cur.kept_docs().collect()} == {1, 4}
        finally:
            shutil.rmtree(root, ignore_errors=True)
