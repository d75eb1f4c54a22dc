"""Incremental dup-cluster maintenance (streaming/cluster_stream.py):
the fold over micro-batches of verified pairs must equal batch
connected-components over the union of all edges BIT-FOR-BIT, survive
replays and duplicate edge deliveries, and merge clusters across
batches (the case a per-batch CC cannot see)."""

from __future__ import annotations

import pytest

from construction_data_lake_et_data_warehouse_tp3_spark.operators.curation import (
    cluster_edges,
)
from construction_data_lake_et_data_warehouse_tp3_spark.streaming.cluster_stream import (
    StreamingClusterMaintainer,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def _canon(df):
    return sorted(
        (r.doc_id, r.cluster_id, r.cluster_size, r.is_canonical)
        for r in df.collect()
    )


class TestStreamingClusters:
    def test_incremental_equals_batch_bit_for_bit(self, spark, tmp_path):
        """Three micro-batches whose edges interleave three components —
        including a batch-2 bridge that merges two earlier clusters —
        must produce exactly cluster_edges(all edges)."""
        batches = [
            [(1, 2), (5, 6), (10, 11)],
            [(2, 3), (11, 12)],
            [(3, 5), (20, 21)],  # bridge: {1,2,3} + {5,6} -> one cluster
        ]
        m = StreamingClusterMaintainer(spark, str(tmp_path / "store"))
        for i, rows in enumerate(batches):
            m.process_batch(_pairs(spark, rows), i)
        all_edges = _pairs(spark, [e for rows in batches for e in rows])
        truth = _canon(m.clusters())
        assert truth == _canon(cluster_edges(all_edges))
        # the bridged cluster collapsed to the global min label
        got = {r.doc_id: r.cluster_id for r in m.clusters().collect()}
        assert got[6] == 1 and got[5] == 1 and got[3] == 1
        # replay + redelivery noops on the SAME store (merged here from a
        # standalone test: one maintainer setup instead of two, identical
        # coverage): exact replay (same batch id) ledger-short-circuits,
        # and the same edges under a NEW batch id are an idempotent fold
        # (reversed orientation included).
        c = m.process_batch(_pairs(spark, batches[0]), 0)
        assert c == {"edges": 0, "relabeled": 0}
        assert _canon(m.clusters()) == truth
        m.process_batch(
            _pairs(spark, [(b, a) for a, b in batches[1]]), len(batches)
        )
        assert _canon(m.clusters()) == truth

    def test_order_independence(self, spark, tmp_path):
        """The fold is commutative across batch orderings: both arrival
        orders converge to the same labels (the second half arriving
        first forces the late-bridge merge path in maintainer b)."""
        first, second = [(1, 5), (5, 9)], [(2, 9), (30, 31)]
        a = StreamingClusterMaintainer(spark, str(tmp_path / "a"))
        a.process_batch(_pairs(spark, first), 0)
        a.process_batch(_pairs(spark, second), 1)
        b = StreamingClusterMaintainer(spark, str(tmp_path / "b"))
        b.process_batch(_pairs(spark, second), 0)
        b.process_batch(_pairs(spark, first), 1)
        assert _canon(a.clusters()) == _canon(b.clusters())
        got = {r.doc_id: r.cluster_id for r in a.clusters().collect()}
        assert got == {1: 1, 5: 1, 9: 1, 2: 1, 30: 30, 31: 30}

    def test_empty_batch_and_self_pairs_ignored(self, spark, tmp_path):
        m = StreamingClusterMaintainer(spark, str(tmp_path / "store"))
        c = m.process_batch(_pairs(spark, []), 0)
        assert c["edges"] == 0
        m.process_batch(_pairs(spark, [(7, 7)]), 1)  # self-loop: no edge
        assert m.clusters().count() == 0

    def test_differential_vs_dup_clusters_on_corpus(self, spark, tmp_path):
        """Real-pipeline differential: the sf0.001 minhash-verified pairs
        split into 2 micro-batches must reproduce the batch dup_clusters
        labels exactly (VERDICT r5 ask #8's operative check)."""
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.curation import (
            dup_clusters,
        )
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.pipelines import (
            minhash_verified_dups,
        )

        pairs = (
            minhash_verified_dups(spark, SF_DIR)
            .select("doc_a", "doc_b")
            .persist()
        )
        n = pairs.count()
        if n == 0:
            pytest.skip("no verified dup pairs at this SF")
        m = StreamingClusterMaintainer(spark, str(tmp_path / "store"))
        splits = pairs.randomSplit([1.0, 1.0], seed=7)
        for i, part in enumerate(splits):
            m.process_batch(part, i)
        assert _canon(m.clusters()) == _canon(dup_clusters(spark, SF_DIR))
        pairs.unpersist()

    def test_attach_drains_a_real_stream(self, spark, tmp_path):
        pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
        src = str(tmp_path / "src")
        pairs.write.parquet(src)
        stream = spark.readStream.schema(pairs.schema).parquet(src)
        m = StreamingClusterMaintainer(spark, str(tmp_path / "store"))
        q = m.attach(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        assert _canon(m.clusters()) == _canon(cluster_edges(pairs))

    def test_distributed_remap_path_equals_local(self, spark, tmp_path, monkeypatch):
        """Force the size gate to 0 so the DISTRIBUTED min-label branch
        computes the remap; result must equal the local union-find run."""
        from construction_data_lake_et_data_warehouse_tp3_spark.streaming import (
            cluster_stream,
        )

        batches = [[(1, 2), (5, 6)], [(2, 5), (8, 9)]]
        a = StreamingClusterMaintainer(spark, str(tmp_path / "a"))
        for i, rows in enumerate(batches):
            a.process_batch(_pairs(spark, rows), i)
        monkeypatch.setattr(cluster_stream, "SMALL_GRAPH_EDGES", 0)
        b = StreamingClusterMaintainer(spark, str(tmp_path / "b"))
        for i, rows in enumerate(batches):
            b.process_batch(_pairs(spark, rows), i)
        assert _canon(a.clusters()) == _canon(b.clusters())
