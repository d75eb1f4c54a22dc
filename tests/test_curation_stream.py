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
    def test_gate_dedup_replay_flow(self, spark, store):
        """One flow, three contracts (merged — each process_batch is
        several MERGE jobs): within-batch gate+dedup, cross-batch
        first-wins, and at-least-once replay idempotence."""
        cur = StreamingCurator(spark, store)
        batch1 = _batch(spark, [(1, GOOD_A), (2, GOOD_A), (3, LOW_QUALITY), (4, GOOD_B)])
        kept = cur.process_batch(batch1)
        # dup of A (doc 2) and the low-quality doc are dropped
        assert kept == 2
        assert {r.doc_id for r in cur.kept_docs().collect()} == {1, 4}

        # cross-batch: doc 5 duplicates doc 1's content → dropped
        kept = cur.process_batch(_batch(spark, [(5, GOOD_A)]))
        assert kept == 0
        assert {r.doc_id for r in cur.kept_docs().collect()} == {1, 4}
        owners = {r.h: r.doc_id for r in cur.content_hashes().collect()}
        assert len(owners) == 2

        # replay batch 1 (at-least-once redelivery): survivors pass
        # again, dups stay dropped — state unchanged
        assert cur.process_batch(batch1) == 2
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

    def test_dirty_batch_is_quarantined(self, spark, store):
        """r8 dirty-input extension: NULL/empty/whitespace documents in a
        micro-batch must fail the quality gate (NULL ratios -> NULL keep,
        the batch corpus_curation semantics the maintainer imports), not
        crash the fold or occupy a content-hash slot that would shadow a
        later real document."""
        cur = StreamingCurator(spark, store)
        kept = cur.process_batch(
            _batch(spark, [(1, GOOD_A), (2, None), (3, ""), (4, "   ")])
        )
        assert kept == 1
        assert {r.doc_id for r in cur.kept_docs().collect()} == {1}
        # the dirty rows must not own content hashes: a later real doc
        # whose md5 collides with '' semantics must still be judged on
        # its own merits
        assert cur.process_batch(_batch(spark, [(5, GOOD_B)])) == 1
        assert {r.doc_id for r in cur.kept_docs().collect()} == {1, 5}
