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


class TestKCore:
    def _write(self, spark, tmp_path, baskets):
        """Each basket (one order) induces a clique among its parts."""
        import datetime

        ts = datetime.datetime(2024, 1, 1)
        rows = [
            (ok, pk, ts) for ok, parts in enumerate(baskets) for pk in parts
        ]
        out = str(tmp_path / "sf")
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long, l_shipdate timestamp"
        ).coalesce(1).write.parquet(f"{out}/lineitem.parquet")
        return out

    def test_peel_cascade_on_planted_graph(self, spark, tmp_path):
        """4-clique (deg 3 each) + a chain hanging off it: at k=3 the
        chain peels over successive rounds while the clique survives
        with its induced degrees intact."""
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.graph import (
            kcore_products,
        )

        # clique {1,2,3,4} via one basket; chain 4-10-11 via pair baskets
        out = self._write(spark, tmp_path, [[1, 2, 3, 4], [4, 10], [10, 11]])
        got = {
            r.part_id: r.core_degree
            for r in kcore_products(spark, out, k=3, rounds=3).collect()
        }
        # chain nodes 10, 11 peel (deg < 3); node 4's induced degree
        # falls back to 3 once they are gone; clique survives whole
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_rounds_matter_for_cascades(self, spark, tmp_path):
        """A pendant chain needs one round PER LINK to peel — rounds=1
        keeps the middle node alive, rounds=2 completes the cascade
        (locks that the loop really iterates)."""
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.graph import (
            kcore_products,
        )

        out = self._write(spark, tmp_path, [[1, 2, 3], [3, 10], [10, 11]])
        r1 = {r.part_id for r in kcore_products(spark, out, k=2, rounds=1).collect()}
        r2 = {r.part_id for r in kcore_products(spark, out, k=2, rounds=2).collect()}
        assert 10 in r1  # deg(10)=2 while 11 still alive
        assert r2 == {1, 2, 3}  # 11 gone -> deg(10)=1 -> peeled


class TestAssortativityDegenerate:
    def test_regular_graph_is_null_not_divide_by_zero(self, spark, tmp_path):
        """A cycle (every endpoint degree 2) zeroes both variance terms —
        assortativity is undefined, so the result must be NULL rather
        than an ANSI DIVIDE_BY_ZERO (found by the r7 degenerate-input
        probes; the oracle carries the same guard so the hash locks)."""
        import datetime

        from construction_data_lake_et_data_warehouse_tp3_spark.operators.graph import (
            degree_assortativity,
        )

        ts = datetime.datetime(2024, 1, 1)
        rows = [
            (o, pk, ts)
            for o, pair in enumerate([(101, 102), (102, 103), (103, 101)])
            for pk in pair
        ]
        out = str(tmp_path / "sf")
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long, l_shipdate timestamp"
        ).coalesce(1).write.parquet(f"{out}/lineitem.parquet")
        got = degree_assortativity(spark, out).collect()
        assert len(got) == 1
        assert got[0].n_edges == 6  # 3 undirected edges, both orientations
        assert got[0].assortativity is None
