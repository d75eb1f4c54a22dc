"""Planted-near-dup validation for the bucketed embedding dedup path.

The driver testdata embeddings top out around cosine 0.6, so
`embedding_dup_pairs[_bucketed]` both return 0 rows there (hash-green but
vacuous). These tests plant real near-duplicate vectors and check the
three properties the oracle can't see on that corpus:

1. soundness  — bucketed output ⊆ brute-force output (no false pairs);
2. recall     — planted cosine≈0.999 pairs are found at ≥ the analytic
                1-(1-p^8)^2 rate (~0.99 at that similarity);
3. selectivity— same-bucket candidate pairs are a small fraction of all
                pairs (the whole point of bucketing).
"""

from __future__ import annotations

import numpy as np
import pytest

from construction_data_lake_et_data_warehouse_tp3_spark.operators.similarity import (
    _banded_vectors,
    _vectors,
    embedding_dup_pairs,
    embedding_dup_pairs_bucketed,
)

N_BACKGROUND = 200
N_PLANTED_PAIRS = 20
DIM = 64


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """embeddings.parquet with gaussian background + planted near-dups
    (base + 1% noise ⇒ cosine ≈ 0.999)."""
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for _ in range(N_BACKGROUND):
        rows.append((vid, "bg", rng.normal(size=DIM).astype("float32").tolist()))
        vid += 1
    for _ in range(N_PLANTED_PAIRS):
        base = rng.normal(size=DIM)
        near = base + 0.01 * rng.normal(size=DIM)
        rows.append((vid, "planted", base.astype("float32").tolist()))
        rows.append((vid + 1, "planted", near.astype("float32").tolist()))
        vid += 2
    out = str(tmp_path_factory.mktemp("planted"))
    df = spark.createDataFrame(rows, "vec_id bigint, label string, embedding array<float>")
    df.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def test_bucketed_subset_of_bruteforce(spark, planted_dir):
    brute = {
        (r.vec_a, r.vec_b) for r in embedding_dup_pairs(spark, planted_dir).collect()
    }
    bucketed = {
        (r.vec_a, r.vec_b)
        for r in embedding_dup_pairs_bucketed(spark, planted_dir).collect()
    }
    assert bucketed <= brute


def test_bucketed_recall_on_planted_pairs(spark, planted_dir):
    planted = {
        (N_BACKGROUND + 2 * i, N_BACKGROUND + 2 * i + 1)
        for i in range(N_PLANTED_PAIRS)
    }
    brute = {
        (r.vec_a, r.vec_b) for r in embedding_dup_pairs(spark, planted_dir).collect()
    }
    assert planted <= brute, "brute force must see every planted pair"
    bucketed = {
        (r.vec_a, r.vec_b)
        for r in embedding_dup_pairs_bucketed(spark, planted_dir).collect()
    }
    found = len(bucketed & planted)
    # analytic recall at cosine .999 is ~.99 per pair; 16/20 leaves slack
    # for the hyperplane draw while still failing on any systematic bug
    assert found >= 16, f"bucketed found only {found}/{N_PLANTED_PAIRS} planted pairs"


def test_bucket_candidate_selectivity(spark, planted_dir):
    from pyspark.sql import functions as F

    sigs = _banded_vectors(_vectors(spark, planted_dir)).select(
        "band", "sig", "vec_id"
    )
    cands = (
        sigs.alias("a")
        .join(sigs.alias("b"), ["band", "sig"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    n = N_BACKGROUND + 2 * N_PLANTED_PAIRS
    all_pairs = n * (n - 1) // 2
    assert cands < 0.10 * all_pairs, (
        f"bucketing kept {cands}/{all_pairs} pairs — not selective"
    )
