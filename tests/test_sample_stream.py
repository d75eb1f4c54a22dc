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


class TestStreamingQuantiles:
    def _rows(self, spark, vals):
        return spark.createDataFrame(
            [(i, "g", v) for i, v in enumerate(vals)],
            "doc_id long, lang string, cents long",
        )

    def test_sample_covers_all_gives_exact_disc_percentiles(self, spark, tmp_path):
        """k >= n: the maintained sample IS the data, so the estimates
        must equal exact disc percentiles (value at ceil(p*n))."""
        vals = [100, 200, 300, 400, 500, 600, 700, 800, 900, 1000]
        s = StreamingFixedKSampler(
            spark, str(tmp_path / "s"), k=100, value_col="cents"
        )
        s.process_batch(self._rows(spark, vals[:5]), 0)
        s.process_batch(self._rows(spark, vals[5:]).withColumn(
            "doc_id", F.col("doc_id") + 5), 1)
        r = s.quantiles((0.5, 0.9)).collect()[0]
        assert r.n_sample == 10
        assert r.p50_est == 500  # ceil(0.5*10) = 5th smallest
        assert r.p90_est == 900  # ceil(0.9*10) = 9th smallest

    def test_stream_fold_matches_batch_bottom_k(self, spark, tmp_path):
        """Quantiles off the streamed sample == quantiles off a one-shot
        bottom-k over the same rows (same coin, same pick)."""
        import hashlib

        vals = [(i, (i * 37) % 1000 + 1) for i in range(200)]
        rows = spark.createDataFrame(
            [(i, "g", v) for i, v in vals], "doc_id long, lang string, cents long"
        )
        k = 32
        s = StreamingFixedKSampler(
            spark, str(tmp_path / "s"), k=k, value_col="cents"
        )
        s.process_batch(rows.where("doc_id < 80"), 0)
        s.process_batch(rows.where("doc_id >= 80"), 1)
        s.process_batch(rows.where("doc_id < 80"), 2)  # redelivery no-op
        got = s.quantiles((0.5, 0.9)).collect()[0]
        # reference: python bottom-k by the same md5 coin
        coined = sorted(
            ((hashlib.md5(str(i).encode()).hexdigest(), i, v) for i, v in vals)
        )[:k]
        ordered = sorted((v, h) for h, _, v in coined)
        n = len(ordered)
        p50 = ordered[(n + 1) // 2 - 1][0]
        p90 = ordered[(9 * n + 9) // 10 - 1][0]
        assert (got.n_sample, got.p50_est, got.p90_est) == (n, p50, p90)


class TestDirtyBatches:
    def test_null_keys_keep_stream_equal_to_batch(self, spark, tmp_path):
        """r8 dirty-input extension: rows with a NULL group key or a NULL
        doc_id must fold through the maintained bottom-k store exactly
        as the batch window treats them (both sides are Spark, so NULL
        grouping/ordering is consistent by construction — the lock is
        that the MERGE path doesn't drop, duplicate, or crash on them)."""
        s = StreamingFixedKSampler(spark, str(tmp_path / "s"), k=3)
        b0 = _batch(spark, [(1, "en"), (2, None), (None, "en"), (4, "fr")])
        b1 = _batch(spark, [(5, "en"), (None, None), (6, None)])
        s.process_batch(b0, 0)
        s.process_batch(b1, 1)
        union = b0.unionByName(b1)

        def canon_nullsafe(df):  # plain tuple sort TypeErrors on None keys
            return sorted(
                ((r.doc_id, r.lang, r.sample_rank) for r in df.collect()),
                key=lambda t: tuple((v is None, str(v)) for v in t),
            )

        assert canon_nullsafe(s.sample()) == canon_nullsafe(
            _batch_sample(union, 3)
        )
