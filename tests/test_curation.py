"""Curation operators: connected-components clustering semantics.

The end-to-end dup_clusters/corpus_curation/stratified_sample queries are
hash-checked against DuckDB oracles in test_oracle_parity.py (dup_clusters
against a WITH RECURSIVE reachability query); these tests pin the
propagation loop's graph semantics on planted edge lists, where
transitivity and convergence can be asserted exactly.
"""

from __future__ import annotations

from construction_data_lake_et_data_warehouse_tp3_spark.operators.curation import (
    MAX_CC_ITERS,
    cluster_edges,
)


def _clusters(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = cluster_edges(df).collect()
    by_doc = {r.doc_id: r for r in rows}
    return rows, by_doc


def test_chain_is_transitively_clustered(spark):
    """1-2 and 2-3 verified, 1-3 never tested: all three must still land
    in ONE cluster with 1 as the canonical survivor."""
    rows, by_doc = _clusters(spark, [(1, 2), (2, 3), (10, 11)])
    assert {r.doc_id for r in rows} == {1, 2, 3, 10, 11}
    assert {by_doc[d].cluster_id for d in (1, 2, 3)} == {1}
    assert {by_doc[d].cluster_id for d in (10, 11)} == {10}
    assert by_doc[1].cluster_size == 3 and by_doc[10].cluster_size == 2
    assert [r.doc_id for r in rows if r.is_canonical] in ([1, 10], [10, 1])


def test_long_path_converges_within_iteration_bound(spark):
    """A worst-case path graph (diameter = MAX_CC_ITERS) still collapses
    to one cluster — min-label propagation covers distance ~2^k after k
    rounds only on dense graphs; on a path it needs diameter rounds, so
    the bound must hold for the longest chain the cap admits."""
    n = MAX_CC_ITERS
    rows, by_doc = _clusters(spark, [(i, i + 1) for i in range(1, n + 1)])
    assert {r.cluster_id for r in rows} == {1}
    assert by_doc[1].cluster_size == n + 1


def test_diameter_beyond_cap_raises_not_partial(spark):
    """A chain whose diameter exceeds the cap (+1 verification round)
    must RAISE rather than silently return unconverged labels, and the
    same graph converges exactly with max_iters=None (the streaming
    maintainer's batch-bounded reduced-graph mode)."""
    import pytest

    n = MAX_CC_ITERS + 2  # needs n rounds; cap admits MAX_CC_ITERS + 1
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n + 1)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_edges(df).collect()
    rows = cluster_edges(df, max_iters=None).collect()
    assert {r.cluster_id for r in rows} == {1}
    assert len(rows) == n + 1


def test_star_and_reversed_edges(spark):
    """Hub-and-spoke with edges pointing both ways resolves to the min id
    even when the min is a leaf."""
    rows, by_doc = _clusters(spark, [(5, 2), (5, 3), (4, 5), (1, 5)])
    assert {r.cluster_id for r in rows} == {1}
    assert by_doc[5].cluster_size == 5
