"""Incremental fixed-k sampler (streaming/sample_stream.py): at every
prefix the maintained sample must equal the batch fixed_k_sample over
everything ingested so far, replays/redeliveries must be no-ops by
algebra (no ledger), state must stay bounded at K per group."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from construction_data_lake_et_data_warehouse_tp3_spark.streaming.sample_stream import (
    StreamingFixedKSampler,
)

SF_DIR = "/root/testdata/sf0.001"
K = 5


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _batch_sample(df, k):
    """The batch operator's window, applied to an arbitrary frame."""
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        df.select("doc_id", "lang", F.md5(F.expr("CAST(doc_id AS STRING)")).alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "lang", F.col("rn").cast("bigint").alias("sample_rank"))
    )


def _canon(df):
    return sorted((r.doc_id, r.lang, r.sample_rank) for r in df.collect())


class TestStreamingFixedK:
    def test_prefix_equality_with_batch_operator(self, spark, tmp_path):
        """After EVERY batch the stream sample == batch operator over the
        union of all ingested rows, bit-for-bit."""
        s = StreamingFixedKSampler(spark, str(tmp_path / "s"), k=K)
        seen = []
        batches = [
            [(i, "en") for i in range(10)] + [(100 + i, "fr") for i in range(3)],
            [(20 + i, "en") for i in range(10)],
            [(200 + i, "fr") for i in range(10)] + [(300, "es")],
        ]
        for i, rows in enumerate(batches):
            s.process_batch(_batch(spark, rows), i)
            seen.extend(rows)
            assert _canon(s.sample()) == _canon(
                _batch_sample(_batch(spark, seen), K)
            ), f"diverged after batch {i}"

    def test_redelivery_and_order_independence(self, spark, tmp_path):
        rows = [(i, "en") for i in range(25)]
        a = StreamingFixedKSampler(spark, str(tmp_path / "a"), k=K)
        a.process_batch(_batch(spark, rows[:10]), 0)
        a.process_batch(_batch(spark, rows[5:]), 1)  # overlap = redelivery
        a.process_batch(_batch(spark, rows[:10]), 2)  # full replay
        b = StreamingFixedKSampler(spark, str(tmp_path / "b"), k=K)
        b.process_batch(_batch(spark, rows), 0)  # one shot
        assert _canon(a.sample()) == _canon(b.sample())

    def test_state_bounded_at_k_per_group(self, spark, tmp_path):
        s = StreamingFixedKSampler(spark, str(tmp_path / "s"), k=K)
        for i in range(4):
            s.process_batch(
                _batch(spark, [(100 * i + j, "en") for j in range(50)]), i
            )
        stored = s._candidates()
        assert stored.count() == K  # one group, exactly K candidates
        assert s.sample().count() == K

    def test_differential_vs_registry_fixed_k_sample(self, spark, tmp_path):
        """Real-corpus differential: the sf0.001 documents streamed in 3
        chunks reproduce the registry fixed_k_sample exactly."""
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.curation import (
            FIXED_K_PER_LANG,
            fixed_k_sample,
        )
        from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import (
            load_table,
        )

        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
        s = StreamingFixedKSampler(
            spark, str(tmp_path / "s"), k=FIXED_K_PER_LANG
        )
        for i, part in enumerate(docs.randomSplit([1.0, 1.0, 1.0], seed=3)):
            s.process_batch(part, i)
        assert _canon(s.sample()) == _canon(fixed_k_sample(spark, SF_DIR))

    def test_attach_drains_a_real_stream(self, spark, tmp_path):
        rows = _batch(spark, [(i, "en" if i % 2 else "fr") for i in range(40)])
        src = str(tmp_path / "src")
        rows.write.parquet(src)
        stream = spark.readStream.schema(rows.schema).parquet(src)
        s = StreamingFixedKSampler(spark, str(tmp_path / "store"), k=K)
        q = s.attach(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        assert _canon(s.sample()) == _canon(_batch_sample(rows, K))
