"""Property tests: the map-only sorted-run folds in operators/quality.py
must agree with naive Python counting on arbitrary word lists — the fold
is the scale path, so its correctness can't rest on one corpus shape."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

words = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=4), min_size=1, max_size=30
)


@pytest.fixture(scope="module")
def run_fold(request):
    """Compile the _RUN_FOLD expression once against a tiny helper DF."""
    spark = request.getfixturevalue("spark")
    from pyspark.sql import functions as F

    from construction_data_lake_et_data_warehouse_tp3_spark.operators.quality import (
        _RUN_FOLD,
    )

    def apply(ws: list[str]):
        df = spark.createDataFrame([(ws,)], "ws array<string>")
        row = df.select(F.expr(_RUN_FOLD.format(xs="ws")).alias("r")).collect()[0].r
        return row.best, row.nd

    return apply


@settings(max_examples=12, deadline=None)
@given(ws=words)
def test_run_fold_matches_counter(run_fold, ws):
    best, nd = run_fold(ws)
    counts = Counter(ws)
    assert best == max(counts.values())
    assert nd == len(counts)
