"""Property-based cross-engine tests (SURVEY §5: property tests) for the
fixed-point money layer — the linchpin of every oracle match.

Strategy: hypothesis generates adversarial money values (including exact
decimal midpoints like x.005 and x.015 that break naive double rounding),
all groups evaluate in ONE Spark job and ONE DuckDB query, and every
grouped money_sum/money_avg must agree exactly."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from construction_data_lake_et_data_warehouse_tp3_spark.functions.scalar import (
    money_avg,
    money_avg_sql,
    money_sum,
    money_sum_sql,
)

# money-like doubles: magnitudes from cents to ~500k, plus exact midpoints,
# plus NEGATIVE amounts (refunds/credits) — the sign-aware half-up formula
# must agree across engines on negative group sums too (ADVICE r1)
_money_pos = st.one_of(
    st.floats(min_value=0.01, max_value=500_000, allow_nan=False, allow_infinity=False),
    st.integers(min_value=1, max_value=50_000_000).map(lambda n: n / 100.0),
    st.integers(min_value=0, max_value=5_000_000).map(lambda n: n / 100.0 + 0.005),
    st.integers(min_value=0, max_value=5_000_000).map(lambda n: n / 100.0 + 0.0050000000001),
)
_money = st.one_of(_money_pos, _money_pos.map(lambda v: -v))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    groups=st.lists(
        st.lists(_money, min_size=1, max_size=40), min_size=1, max_size=8
    )
)
def test_money_aggregates_match_duckdb_exactly(spark, groups):
    rows = [(gid, float(v)) for gid, values in enumerate(groups) for v in values]
    df = spark.createDataFrame(rows, "gid int, amount double")
    spark_out = {
        r["gid"]: (r["s"], r["a"])
        for r in df.groupBy("gid")
        .agg(money_sum("amount").alias("s"), money_avg("amount").alias("a"))
        .collect()
    }

    con = duckdb.connect()
    con.register("t", df.toPandas())
    duck_out = {
        gid: (s, a)
        for gid, s, a in con.execute(
            f"SELECT gid, {money_sum_sql('amount')} AS s, {money_avg_sql('amount')} AS a "
            f"FROM t GROUP BY 1"
        ).fetchall()
    }
    assert spark_out == duck_out  # exact double equality, no tolerance
