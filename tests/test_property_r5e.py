"""Property-based invariants (SURVEY §5) for the r5e statistics
(4 hypothesis examples per property — each example is a full
parquet-write + Spark query at ~3 s, and the invariants are exact
algebraic identities also pinned by planted fixtures in
test_r5e_ops.py, so examples buy breadth, not the core lock;
operators — algebraic identities that must hold on ARBITRARY inputs,
not just the planted fixtures:

- CUSUM telescopes: n·S_n = n·Σx − n·Σx ⇒ the LAST cusum_scaled value
  is exactly 0 on every series, and a constant series is 0 everywhere.
- OLS on exact integer-linear data recovers slope/intercept exactly
  (the closed form's numerator/denominator are exact BIGINTs, and the
  division of two exactly-representable ints is correctly rounded).
- LOO encodings are a redistribution: Σ_i enc_i·(n−1) = (n−1)·Σx when
  n ≥ 2 in a group — each row's encoding is the mean of the others, so
  summing encodings×(n−1) must reproduce (n−1)·group total.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_cents = st.integers(min_value=1, max_value=5_000_000)


def _orders(spark, out, cents_by_day):
    rows = [
        (i, 1, c / 100.0, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i))
        for i, c in enumerate(cents_by_day)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    return out


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(series=st.lists(_cents, min_size=2, max_size=25))
def test_cusum_telescopes_to_zero(spark, tmp_path_factory, series):
    from construction_data_lake_et_data_warehouse_tp3_spark.operators.statistics import (
        cusum_changepoint,
    )

    out = str(tmp_path_factory.mktemp("cusum") / "sf")
    _orders(spark, out, series)
    rows = sorted(cusum_changepoint(spark, out).collect(), key=lambda r: r.day)
    assert rows[-1].cusum_scaled == 0  # S_n = Σx − n·mean telescopes
    assert sum(1 for r in rows if r.is_changepoint) == 1  # exactly one argmax


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    slope=st.integers(min_value=-500, max_value=500),
    intercept=st.integers(min_value=1000, max_value=100_000),
    n_days=st.integers(min_value=3, max_value=28),
)
def test_ols_recovers_exact_linear_series(
    spark, tmp_path_factory, slope, intercept, n_days
):
    from construction_data_lake_et_data_warehouse_tp3_spark.operators.statistics import (
        revenue_trend_slope,
    )

    out = str(tmp_path_factory.mktemp("ols") / "sf")
    # y = intercept + slope·x exactly, x = day of month 1..n (keep y ≥ 1)
    series = [max(intercept + slope * (x + 1), 1) for x in range(n_days)]
    if any(intercept + slope * (x + 1) < 1 for x in range(n_days)):
        series = [intercept + abs(slope) * (x + 1) for x in range(n_days)]
        slope = abs(slope)
    _orders(spark, out, series)
    r = revenue_trend_slope(spark, out).collect()[0]
    assert r.n_days == n_days
    assert r.slope_cents_per_day == float(slope)
    assert r.intercept_cents == float(intercept)


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(groups=st.lists(st.lists(_cents, min_size=2, max_size=12), min_size=1, max_size=4))
def test_loo_encoding_is_a_redistribution(spark, tmp_path_factory, groups):
    from construction_data_lake_et_data_warehouse_tp3_spark.operators.statistics import (
        target_encoding_loo,
    )

    rows, key = [], 0
    for gid, cents in enumerate(groups):
        for c in cents:
            rows.append(
                (key, 1, c / 100.0, datetime.datetime(2024, 1, 1), f"G{gid}")
            )
            key += 1
    out = str(tmp_path_factory.mktemp("loo") / "sf")
    import pyspark.sql.functions as F  # noqa: F401

    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(f"{out}/orders.parquet")
    got = target_encoding_loo(spark, out).collect()
    by_group: dict[str, list] = {}
    for r in got:
        by_group.setdefault(r.o_orderpriority, []).append(r)
    for gid, cents in enumerate(groups):
        rs = by_group[f"G{gid}"]
        n, total = len(cents), sum(cents)
        for r in rs:
            assert r.loo_enc_cents == (total - r.cents) // (n - 1)
