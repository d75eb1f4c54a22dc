"""Sanity + determinism for the Lloyd k-means operator (exact values are
oracle-checked in test_oracle_parity.py)."""

from __future__ import annotations

from construction_data_lake_et_data_warehouse_tp3_spark.operators import clustering
from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestKmeans:
    def test_partitions_all_vectors(self, spark):
        total = load_table(spark, SF_DIR, "embeddings").count()
        rows = clustering.kmeans_embeddings(spark, SF_DIR).collect()
        assert 1 <= len(rows) <= clustering.K_CLUSTERS
        assert sum(r.n_members for r in rows) == total
        assert all(r.inertia >= 0 for r in rows)

    def test_deterministic_across_runs(self, spark):
        a = {r.cluster_id: r for r in clustering.kmeans_embeddings(spark, SF_DIR).collect()}
        b = {r.cluster_id: r for r in clustering.kmeans_embeddings(spark, SF_DIR).collect()}
        assert a.keys() == b.keys()
        for cid in a:
            assert a[cid].n_members == b[cid].n_members
            assert a[cid].inertia == b[cid].inertia
            assert a[cid].centroid_norm == b[cid].centroid_norm

    def test_ivf_recall_against_brute_force(self, spark):
        """IVF probes NPROBE/K of the corpus, so it's allowed to miss —
        but the neighbors it does return must carry the same cosine the
        brute-force scorer assigns, and recall@5 against cosine_topk
        should clear a floor on this clustered corpus."""
        from construction_data_lake_et_data_warehouse_tp3_spark.operators import similarity

        ivf = {
            (r.query_id, r.cand_id): r.cosine
            for r in clustering.ivf_kmeans_topk(spark, SF_DIR).collect()
        }
        brute = {
            (r.query_id, r.cand_id): r.cosine
            for r in similarity.cosine_topk(spark, SF_DIR).collect()
        }
        assert ivf
        hits = sum(1 for k in ivf if k in brute)
        assert hits / len(brute) >= 0.3, (hits, len(brute))
        for k in ivf.keys() & brute.keys():
            assert abs(ivf[k] - brute[k]) < 1e-9

    def test_ivf_broadcasts_centroids(self, spark):
        """The coarse-quantizer joins must broadcast the K centroid rows —
        a shuffled centroid join would serialize the whole corpus through
        an exchange for an 8-row dim."""
        from construction_data_lake_et_data_warehouse_tp3_spark.plans import (
            has_broadcast_join,
        )

        assert has_broadcast_join(clustering.ivf_kmeans_topk(spark, SF_DIR))

    def test_update_moves_centroids_toward_members(self, spark):
        """After one exact-integer update, every centroid is the mean of
        its members: re-assigning with the updated centroids can only
        lower (or keep) total inertia — the Lloyd monotonicity that makes
        the iteration converge."""
        from pyspark.sql import functions as F

        vecs = clustering._vectors(spark, SF_DIR)
        c0 = vecs.where(F.col("vec_id") < clustering.K_CLUSTERS).select(
            F.col("vec_id").alias("cid"), F.col("vd").alias("cd")
        )
        a1 = clustering._assign(vecs, c0)
        inertia0 = a1.agg(F.sum("dist2")).collect()[0][0]
        c1 = clustering._update(a1)
        a2 = clustering._assign(vecs, c1)
        inertia1 = a2.agg(F.sum("dist2")).collect()[0][0]
        assert inertia1 <= inertia0 + 1e-9
