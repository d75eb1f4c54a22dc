"""Registry-wide physical-plan lint: EVERY queries() entry is compiled
and scanned for the two anti-patterns that silently kill 100 TB runs —

- CartesianProduct: a cross join whose small side LOST its broadcast
  (the brute-force baselines in similarity.py broadcast a K-row side on
  purpose; a plain CartesianProduct is always a regression);
- BatchEvalPython: a row-at-a-time Python UDF in the plan (the only
  sanctioned Python is Arrow-batched — ArrowEvalPython / mapInPandas /
  mapInArrow).

Per-operator plan locks pin specific shapes; this net catches the
query NOBODY remembered to lock.  Surveyed clean across all 174
registry entries when introduced (62 s full build); the iterative
operators that materialize localCheckpoints at PLAN-BUILD time are
excluded here to keep the lint cheap — each carries its own plan-lock
or differential test.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

#: iterative/trained operators whose DataFrame CONSTRUCTION runs jobs
#: (k-means training, label propagation, PageRank localCheckpoints) —
#: linted implicitly by their own tests, skipped here for suite cost.
_BUILD_TIME_HEAVY = {
    "kmeans_embeddings",
    "ivf_kmeans_topk",
    "semdedup_pairs",
    "pagerank_products",
    "triangle_participation",
    "dup_clusters",
    "corpus_curation",
    "cluster_representatives",
    "leakage_safe_split",
    "minhash_verified_dups",
    "training_manifest",
    "bpe_token_count",
}

_NAMES = sorted(set(entry_mod.queries()) - _BUILD_TIME_HEAVY)


def test_no_cartesian_and_no_row_python(spark):
    """One test, all plans: compiled on a thread pool (Catalyst plan
    compilation is driver-side and thread-safe), failures aggregated by
    name — 49 s sequential → ~15 s, same coverage."""
    from concurrent.futures import ThreadPoolExecutor

    queries = entry_mod.queries()

    def lint(name):
        df = queries[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        problems = []
        if "CartesianProduct" in plan:
            problems.append(f"{name}: unbroadcast cross join")
        if "BatchEvalPython" in plan:
            problems.append(f"{name}: row-at-a-time Python UDF")
        return problems

    with ThreadPoolExecutor(max_workers=8) as pool:
        found = [p for ps in pool.map(lint, _NAMES) for p in ps]
    assert not found, found
