"""Incremental IVF index (streaming.ann_stream): batch-vs-stream
assignment parity, replay idempotence, and ANN quality — nprobe=K probes
every cell, so its top-k must EQUAL brute-force exact cosine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.operators.clustering import (
    K_CLUSTERS,
    _train,
    _vectors,
)
from construction_data_lake_et_data_warehouse_tp3_spark.streaming import (
    StreamingVectorIndex,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def centroids(spark):
    return _train(_vectors(spark, SF_DIR)).localCheckpoint(eager=True)


def _emb(spark):
    from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import (
        load_table,
    )

    return load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")


class TestStreamingVectorIndex:
    def test_stream_build_replay_and_exact_topk(self, spark, tmp_path, centroids):
        emb = _emb(spark)
        n_total = emb.count()
        topic = str(tmp_path / "vecs")
        emb.coalesce(2).write.mode("overwrite").parquet(topic)

        index = StreamingVectorIndex(spark, str(tmp_path / "index"), centroids)
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)  # force ≥2 micro-batches
            .parquet(topic)
        )
        index.attach(stream, str(tmp_path / "ckpt")).awaitTermination(120)
        assert index.size() == n_total

        # replay the same input through a FRESH checkpoint: the MERGE on
        # vec_id absorbs the redelivery — size unchanged
        stream2 = spark.readStream.schema(emb.schema).parquet(topic)
        index.attach(stream2, str(tmp_path / "ckpt2")).awaitTermination(120)
        assert index.size() == n_total

        # nprobe = K probes every cell ⇒ results must EQUAL brute force
        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = {
            (r.query_id, r.rank): r.cand_id
            for r in index.topk(queries, k=5, nprobe=K_CLUSTERS).collect()
        }
        brute = self._brute_topk(spark, emb, k=5)
        assert got == brute

        # real ANN setting: nprobe=2 keeps ≥ 3/5 of the exact top-5
        # (recall floor, same discipline as the batch IVF recall test)
        approx = index.topk(queries, k=5, nprobe=2).collect()
        by_q = {}
        for r in approx:
            by_q.setdefault(r.query_id, set()).add(r.cand_id)
        exact_by_q = {}
        for (qid, _rank), cand in brute.items():
            exact_by_q.setdefault(qid, set()).add(cand)
        for qid, exact in exact_by_q.items():
            assert len(by_q.get(qid, set()) & exact) >= 3, qid

    def _brute_topk(self, spark, emb, k):
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.clustering import (
            SCALE,
            _DOT,
            _NORM,
        )
        from pyspark.sql import Window

        vecs = emb.select(
            "vec_id",
            F.expr(
                f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT) / CAST({SCALE} AS DOUBLE))"
            ).alias("vd"),
        ).withColumn("nrm", F.expr(_NORM.format(a="vd")))
        q = vecs.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("vd").alias("qv"), F.col("nrm").alias("qn")
        )
        c = vecs.select(
            F.col("vec_id").alias("cand_id"), F.col("vd").alias("cv"), F.col("nrm").alias("cn")
        )
        cosine = F.round(F.expr(_DOT.format(a="qv", b="cv")) / (F.col("qn") * F.col("cn")), 4)
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
        top = (
            q.crossJoin(c)
            .where(F.col("query_id") != F.col("cand_id"))
            .select("query_id", "cand_id", cosine.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        return {(r.query_id, r.rank): r.cand_id for r in top.collect()}

    def test_batch_and_stream_assignments_agree(self, spark, tmp_path, centroids):
        """The streaming index's cell assignment must be bit-identical to
        the batch _assign — same _prep representation, same argmin."""
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.clustering import (
            _assign,
        )

        emb = _emb(spark).limit(50)
        index = StreamingVectorIndex(spark, str(tmp_path / "idx2"), centroids)
        index.process_batch(emb)
        stored = {(r.vec_id, r.cid) for r in index.table.read().collect()}
        batch = {
            (r.vec_id, r.cid)
            for r in _assign(
                StreamingVectorIndex._prep(emb), centroids
            ).collect()
        }
        assert stored == batch
