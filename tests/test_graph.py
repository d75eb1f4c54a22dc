"""PageRank sanity (exact values oracle-checked in test_oracle_parity)."""

from __future__ import annotations

from construction_data_lake_et_data_warehouse_tp3_spark.operators import graph

SF_DIR = "/root/testdata/sf0.001"


class TestPageRank:
    def test_topk_shape_and_determinism(self, spark):
        a = graph.pagerank_products(spark, SF_DIR).collect()
        b = graph.pagerank_products(spark, SF_DIR).collect()
        assert 0 < len(a) <= graph.TOP_K
        assert [(r.part_id, r.rank) for r in a] == [(r.part_id, r.rank) for r in b]
        # descending rank with part_id tiebreak
        ranks = [r.rank for r in a]
        assert ranks == sorted(ranks, reverse=True)
        assert all(r.rank > 0 for r in a)

    def test_edges_are_symmetric_and_loop_free(self, spark):
        edges = graph._edges(spark, SF_DIR)
        assert edges.where("src = dst").count() == 0
        fwd = {(r.src, r.dst) for r in edges.collect()}
        assert all((d, s) in fwd for (s, d) in fwd)  # both orientations

    def test_pagerank_iterated_plan_depth_constant(self, spark):
        """Plan lock for the eager localCheckpoints (graph.py): the final
        plan must NOT grow with N_ITERS — checkpointed ranks/edges enter
        each iteration as scans, so the physical plan contains exactly one
        iteration's operators regardless of the loop count. Lineage replay
        (the 'optimization' the eager=True guards against) would make the
        plan string grow superlinearly and re-run the edge self-join every
        iteration."""
        import unittest.mock as mock

        def plan_len(n_iters):
            with mock.patch.object(graph, "N_ITERS", n_iters):
                df = graph.pagerank_products(spark, SF_DIR)
            return len(df._jdf.queryExecution().executedPlan().toString())

        one, three = plan_len(1), plan_len(3)
        # identical modulo checkpoint ids: allow a few % of string noise
        assert three <= one * 1.1, (one, three)
