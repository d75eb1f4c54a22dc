"""Persisted ANN index (lake/ann.py): the fit-once / probe-forever
contract. The load-bearing lock is query-after-reload == query-against-
fresh-fit — any precision loss, stale-version read, or cell-routing bug
in the save/load path breaks the row-for-row equality with the in-memory
ivf_kmeans_topk result, which shares every kernel."""

from __future__ import annotations

from pyspark.sql import functions as F

from construction_data_lake_et_data_warehouse_tp3_spark.lake.ann import AnnIndex
from construction_data_lake_et_data_warehouse_tp3_spark.operators.clustering import (
    N_QUERIES,
    ivf_kmeans_topk,
)
from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(map(tuple, df.collect()))


import pytest


@pytest.fixture(scope="module")
def built_index(spark, tmp_path_factory):
    """One build shared READ-ONLY by the reload-equality and catalog
    tests (each build is ~8 s of training + two versioned exports); the
    version-semantics test builds its own store because it mutates."""
    root = str(tmp_path_factory.mktemp("ann_shared"))
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    meta = AnnIndex.build(spark, root, emb, name="vecidx")
    return root, emb, meta


class TestAnnIndex:
    def test_query_after_reload_equals_fresh_fit(self, spark, built_index):
        root, emb, meta = built_index
        assert meta["centroid_version"] == 1 and meta["posting_version"] == 1
        assert meta["vectors"] == emb.count()

        # a FRESH handle reads everything from the stored tables
        idx = AnnIndex(spark, root, name="vecidx")
        q = emb.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        stored_result = _canon(idx.topk(q))
        fresh_result = _canon(ivf_kmeans_topk(spark, SF_DIR))
        assert stored_result == fresh_result

    def test_rebuild_versions_and_pinned_reads(self, spark, tmp_path):
        """A rebuild claims the next version through the commit log; the
        previous version stays readable by pin, and the default read
        moves to the latest."""
        emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        AnnIndex.build(spark, str(tmp_path), emb)
        half = emb.where("vec_id % 2 = 0")
        meta2 = AnnIndex.build(spark, str(tmp_path), half)
        assert meta2["posting_version"] == 2
        assert meta2["vectors"] == half.count()

        idx = AnnIndex(spark, str(tmp_path))
        assert idx.postings().count() == half.count()  # latest = v2
        assert idx.postings(version=1).count() == emb.count()

        q = emb.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # v2 only holds even vectors -> all candidates even; v1 differs
        v2_cands = {r.cand_id for r in idx.topk(q, version=2).collect()}
        assert v2_cands and all(c % 2 == 0 for c in v2_cands)
        assert _canon(idx.topk(q, version=1)) == _canon(ivf_kmeans_topk(spark, SF_DIR))

    def test_publish_from_streaming_index_equals_fresh_fit(
        self, spark, tmp_path
    ):
        """Streaming ingest → publish → probe must equal the one-shot
        fit: the stream store and the batch path share the assignment
        kernel and the quantizer, so the published snapshot can't
        diverge. Readers pin the published version while the stream
        keeps folding."""
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.clustering import (
            _train,
            _vectors,
        )
        from construction_data_lake_et_data_warehouse_tp3_spark.streaming.ann_stream import (
            StreamingVectorIndex,
        )

        emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        cents = _train(_vectors(spark, SF_DIR))
        sidx = StreamingVectorIndex(spark, str(tmp_path / "stream"), cents)
        sidx.process_batch(emb.where("vec_id % 2 = 0"), 0)
        sidx.process_batch(emb.where("vec_id % 2 = 1"), 1)

        meta = AnnIndex.publish_from(spark, str(tmp_path / "lake"), sidx)
        assert meta["posting_version"] == 1
        assert meta["vectors"] == emb.count()

        idx = AnnIndex(spark, str(tmp_path / "lake"))
        q = emb.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        assert _canon(idx.topk(q)) == _canon(ivf_kmeans_topk(spark, SF_DIR))

    def test_publish_refuses_mismatched_quantizer(self, spark, tmp_path):
        """A stream store assigned under a DIFFERENT quantizer than the
        index's committed centroids must be rejected at publish — cell
        ids are meaningless across quantizers, and a silent pairing
        would return wrong neighbors on every probe."""
        import pytest

        from construction_data_lake_et_data_warehouse_tp3_spark.operators.clustering import (
            _train,
            _vectors,
        )
        from construction_data_lake_et_data_warehouse_tp3_spark.streaming.ann_stream import (
            StreamingVectorIndex,
        )

        emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        AnnIndex.build(spark, str(tmp_path / "lake"), emb)
        idx = AnnIndex(spark, str(tmp_path / "lake"))

        # different quantizer: trained on a shifted subset -> different fp
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.clustering import (
            prep_vectors,
        )

        doubled = emb.select(
            "vec_id",
            F.expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))").alias(
                "embedding"
            ),
        )
        other_cents = _train(prep_vectors(doubled))
        sidx = StreamingVectorIndex(spark, str(tmp_path / "stream"), other_cents)
        sidx.process_batch(emb.where("vec_id < 50"), 0)
        with pytest.raises(ValueError, match="quantizer mismatch"):
            idx.publish_postings(sidx.table.read())

        # the matching store publishes cleanly
        ok = StreamingVectorIndex(spark, str(tmp_path / "stream_ok"), idx.centroids())
        ok.process_batch(emb.where("vec_id < 50"), 0)
        meta = idx.publish_postings(ok.table.read())
        assert meta["posting_version"] == 2 and meta["vectors"] == 50

    def test_publish_refuses_mixed_fingerprint_store(self, spark, built_index):
        """A store whose rows are stamped under TWO quantizers is corrupt
        by definition and must fail DETERMINISTICALLY — the guard compares
        DISTINCT fingerprints, not one arbitrary limit(1) row that could
        let the same corrupt store pass or fail run to run (ADVICE r7)."""
        import pytest

        root, emb, _ = built_index
        idx = AnnIndex(spark, root, name="vecidx")
        good = idx.postings()
        mixed = good.withColumn(
            "qfp",
            F.when(F.col("vec_id") % 2 == 0, F.col("qfp")).otherwise(
                F.lit("0" * 32)
            ),
        )
        with pytest.raises(ValueError, match="mixes rows"):
            idx.publish_postings(mixed)

    def test_index_feeds_are_catalogued_tables(self, spark, built_index):
        """Index components are ordinary version-partitioned table feeds
        under the lake root — visible to feeds list, covered by version
        retention, committed through the commit log."""
        root, _, _ = built_index
        idx = AnnIndex(spark, root, name="vecidx")
        names = {c.feed_name for c in idx.catalog.list()}
        assert {"vecidx_centroids", "vecidx_postings"} <= names
        cfg = idx.catalog.get("vecidx_postings")
        assert cfg.partition_columns() == ("version",)
        assert idx.writer.committed_versions(cfg) == {1}

    def test_partitioned_postings_prune_probe_scan(self, spark, built_index):
        """VERDICT r9 ask #4: the postings version is laid out
        partitionBy("cid") and the probe pushes a static `cid IN
        (probed)` predicate, so (a) results are IDENTICAL to a legacy
        unpartitioned layout of the same rows, and (b) the probe's
        posting scan carries a cid partition filter and is entitled to
        open only the probed cells' files (measured here as the
        directory-level file ratio — the physical form of nprobe/K)."""
        import glob
        import os

        root, emb, _ = built_index
        idx = AnnIndex(spark, root, name="vecidx")
        # one query -> nprobe=2 of K cells probed; more queries would
        # legitimately touch more cells and mask the pruning signal
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        probed = idx.topk(q)
        part_result = _canon(probed)
        assert part_result  # non-degenerate

        # (a) legacy twin: SAME postings rows exported unpartitioned
        legacy = AnnIndex(spark, root, name="legacy")
        legacy.writer.export_table(
            idx.centroids().select("cid", "cd", "qfp"), legacy._cfg("centroids")
        )
        legacy.writer.export_table(
            idx.postings().select("vec_id", "cid", "vint", "qfp"),
            legacy._cfg("postings"),
        )
        assert _canon(legacy.topk(q)) == part_result

        # (b) the executed plan prunes the posting scan on cid
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cid" in plan

        # directory-level pruning ratio: files the static IN-filter
        # entitles the scan to open vs all posting files of the version
        pdir = os.path.join(
            idx.catalog.feed_data_path(idx._cfg("postings")), "version=v1"
        )
        all_files = glob.glob(
            os.path.join(pdir, "**", "*.parquet"), recursive=True
        )
        cells = {
            os.path.relpath(f, pdir).split(os.sep)[0] for f in all_files
        }
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.clustering import (
            _NORM,
            NPROBE,
            prep_vectors,
            probe_cells,
        )

        # the PROBED cells (what the scan's IN-filter admits), not the
        # result cells — a query's winners may concentrate in one cell
        # while the scan still opens every probed cell
        qp = prep_vectors(
            q.select(F.col("query_id").alias("vec_id"), "embedding")
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("vd").alias("qv"),
            F.expr(_NORM.format(a="vd")).alias("qn"),
        )
        probed_cells = {
            f"cid={r.cid}"
            for r in probe_cells(idx.centroids(), qp.where(F.col("qn") > 0))
            .select("cid")
            .distinct()
            .collect()
        }
        assert len(probed_cells) <= NPROBE
        probed_files = [
            f
            for f in all_files
            if os.path.relpath(f, pdir).split(os.sep)[0] in probed_cells
        ]
        ratio = len(probed_files) / len(all_files)
        # K=8 cells, nprobe=2 -> at most 2/8 of the cell dirs; allow
        # file-count skew headroom but require real pruning
        assert len(cells) > NPROBE
        assert ratio < 0.5, f"no pruning: {len(probed_files)}/{len(all_files)}"
