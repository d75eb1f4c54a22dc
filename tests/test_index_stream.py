"""Incremental BM25 index stats (streaming/index_stream.py): the folded
store must serve the EXACT batch bm25_search ranking (incremental index
== full rebuild), replays must not double-count df, compaction must
preserve every stat, and unknown query terms must degrade to df=0."""

from __future__ import annotations

from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.operators.retrieval import (
    QUERY_TERMS,
    bm25_search,
)
from construction_data_lake_et_data_warehouse_tp3_spark.streaming.index_stream import (
    StreamingIndexStats,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _batch_ranking(spark):
    return [tuple(r) for r in bm25_search(spark, SF_DIR).collect()]


class TestStreamingIndexStats:
    def test_incremental_fold_equals_full_rebuild(self, spark, tmp_path):
        docs = _docs(spark)
        idx = StreamingIndexStats(spark, str(tmp_path))
        idx.process_batch(docs.where("doc_id < 250"), 0)
        idx.process_batch(docs.where("doc_id >= 250"), 1)
        got = [tuple(r) for r in idx.score(docs, QUERY_TERMS).collect()]
        assert got == _batch_ranking(spark)

    def test_replay_does_not_double_count(self, spark, tmp_path):
        docs = _docs(spark)
        idx = StreamingIndexStats(spark, str(tmp_path))
        idx.process_batch(docs, 0)
        truth = [tuple(r) for r in idx.score(docs, QUERY_TERMS).collect()]
        assert idx.process_batch(docs, 0) == 0  # ledger short-circuit
        assert [tuple(r) for r in idx.score(docs, QUERY_TERMS).collect()] == truth
        assert truth == _batch_ranking(spark)

    def test_compact_preserves_stats(self, spark, tmp_path):
        docs = _docs(spark)
        idx = StreamingIndexStats(spark, str(tmp_path))
        idx.process_batch(docs.where("doc_id < 100"), 0)
        idx.process_batch(docs.where("doc_id >= 100"), 1)
        stats_before = tuple(idx.stats().collect()[0])
        df_before = sorted(tuple(r) for r in idx.term_df().collect())
        idx.compact()
        assert tuple(idx.stats().collect()[0]) == stats_before
        assert sorted(tuple(r) for r in idx.term_df().collect()) == df_before
        # partial rows folded to one sentinel row per term
        assert idx.term_partials.read().count() == len(df_before)
        # a replay of a folded batch is still a no-op
        assert idx.process_batch(docs.where("doc_id < 100"), 0) == 0

    def test_unknown_term_scores_with_zero_df(self, spark, tmp_path):
        docs = _docs(spark)
        idx = StreamingIndexStats(spark, str(tmp_path))
        idx.process_batch(docs, 0)
        got = idx.score(docs, ("zzz_not_a_token",)).collect()
        # df=0 -> every doc ties at tf=0 with score idf*0 = 0; ranking
        # degrades to the doc_id tie-break, never an error
        assert len(got) > 0 and all(r.score_micro == 0 for r in got)

    def test_attach_drains_a_real_stream(self, spark, tmp_path):
        docs = _docs(spark).select("doc_id", "text")
        src = str(tmp_path / "src")
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        idx = StreamingIndexStats(spark, str(tmp_path / "store"))
        q = idx.attach(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        got = [tuple(r) for r in idx.score(_docs(spark), QUERY_TERMS).collect()]
        assert got == _batch_ranking(spark)


class TestUnbuiltIndex:
    def test_stats_and_term_df_before_any_batch(self, spark, tmp_path):
        """Reads on a store with no folded batch must return empty/zero
        frames, not a raw AnalysisException (ADVICE r5)."""
        from construction_data_lake_et_data_warehouse_tp3_spark.streaming.index_stream import (
            StreamingIndexStats,
        )

        idx = StreamingIndexStats(spark, str(tmp_path / "unbuilt"))
        s = idx.stats().collect()[0]
        assert (s.n_docs, s.total_tokens) == (0, 0)
        assert idx.term_df().count() == 0
