"""KMV distinct-count sketch: accuracy on a planted corpus, the exact
merge property that makes it scale-out safe, and plan locks.

(Replay parity vs the DuckDB oracle is covered for both queries by
tests/test_oracle_parity.py like every other registry entry.)
"""

from __future__ import annotations

import datetime

import pytest

from construction_data_lake_et_data_warehouse_tp3_spark.operators.sketches import (
    KMV_K,
    kmv_distinct_users,
    kmv_user_overlap,
    _h,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """events.parquet with EXACTLY 1,000 distinct users in one event type
    (duplicated rows on purpose: min() must not care) and 200 in another."""
    out = str(tmp_path_factory.mktemp("kmv") / "sf")
    ts = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(1000):
        for rep in range(2):  # duplicates are free for min()
            rows.append((u, ts, u, "big", 1.0, "{}"))
    for u in range(200):
        rows.append((10_000 + u, ts, u, "small", 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


class TestKmvAccuracy:
    def test_estimate_within_sketch_error(self, spark, planted_dir):
        got = {
            r.event_type: r for r in kmv_distinct_users(spark, planted_dir).collect()
        }
        assert got["big"].n_exact == 1000
        assert got["small"].n_exact == 200
        # 1/sqrt(64) ~ 12% expected relative error; 25% is the "estimator
        # is not broken" band (a wrong-space bug is off by orders of mag);
        # measured: -1.6% at n=1000, -11% at n=200
        for r in got.values():
            assert abs(r.err_bp) <= 2500, r

    def test_bottom_k_estimate_within_sketch_error(self, spark, planted_dir):
        """The classical bottom-k order statistic (kmv_distinct_check)
        on the planted 1,150-distinct corpus: exact twin counts the truth,
        the estimate lands in the 1/sqrt(B) band, exact-fallback never
        fires (1,150 > B)."""
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.sketches import (
            kmv_distinct_check,
        )

        row = kmv_distinct_check(spark, planted_dir).collect()[0]
        # 'small' reuses user ids 0..199 of 'big' -> 1000 global distinct
        assert row.n_exact == 1000
        assert row.est_distinct != row.n_exact  # estimator path, not fallback
        assert abs(row.err_bp) <= 2500, row

    def test_bottom_k_small_corpus_is_exact(self, spark):
        """Fewer distinct users than B: the sketch holds every hash, so
        the estimator must fall back to the exact count (err_bp == 0)."""
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.sketches import (
            kmv_distinct_check,
        )

        row = kmv_distinct_check(spark, SF_DIR).collect()[0]
        assert row.n_exact < KMV_K
        assert row.est_distinct == row.n_exact and row.err_bp == 0

    def test_duplicates_do_not_move_the_sketch(self, spark, planted_dir):
        """Same users, different row multiplicity → identical estimate."""
        import pyspark.sql.functions as F

        events = spark.read.parquet(f"{planted_dir}/events.parquet")
        once = events.where("event_type = 'big'").dropDuplicates(["user_id"])
        mins = [F.min(F.expr(_h(j, "spark"))).alias(f"m{j}") for j in range(KMV_K)]
        a = events.where("event_type = 'big'").agg(*mins).collect()[0]
        b = once.agg(*mins).collect()[0]
        assert tuple(a) == tuple(b)


class TestKmvMerge:
    def test_sketch_union_is_elementwise_least(self, spark, planted_dir):
        """The scale-out contract: per-partition sketches combine by
        least() with NO loss — the distributed fold equals the global
        sketch bit-for-bit."""
        import pyspark.sql.functions as F

        events = spark.read.parquet(f"{planted_dir}/events.parquet").where(
            "event_type = 'big'"
        )
        mins = [F.min(F.expr(_h(j, "spark"))).alias(f"m{j}") for j in range(KMV_K)]
        whole = tuple(events.agg(*mins).collect()[0])
        lo = tuple(events.where("user_id < 500").agg(*mins).collect()[0])
        hi = tuple(events.where("user_id >= 500").agg(*mins).collect()[0])
        merged = tuple(min(x, y) for x, y in zip(lo, hi))
        assert merged == whole


class TestKmvPlans:
    @staticmethod
    def _plan(df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_distinct_users_single_scan(self, spark):
        plan = self._plan(kmv_distinct_users(spark, SF_DIR))
        assert plan.count("Scan parquet") == 1
        # the exact count(distinct) twin costs the (type,user) exchange;
        # the sketch path itself adds only the event_type agg exchange
        assert plan.count("Exchange hashpartitioning") <= 2

    def test_overlap_sketch_branch_has_no_keyed_exchange(self, spark):
        plan = self._plan(kmv_user_overlap(spark, SF_DIR))
        # sketch side: global agg (SinglePartition), no hash exchange on
        # user ids; exact-flags side: one user_id exchange
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan


class TestBootstrapCi:
    def test_ci_brackets_the_mean_on_real_data(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.sketches import (
            bootstrap_revenue_ci,
        )

        r = bootstrap_revenue_ci(spark, SF_DIR).collect()[0]
        assert r.boot_lo_cents < r.mean_cents < r.boot_hi_cents
        # at n=1500 orders the bootstrap se of the mean is ~2.5% — a CI
        # wider than ±20% would mean broken weights
        assert r.boot_lo_cents > r.mean_cents * 0.8
        assert r.boot_hi_cents < r.mean_cents * 1.2

    def test_constant_series_collapses_the_interval(self, spark, tmp_path):
        import datetime as dt

        from construction_data_lake_et_data_warehouse_tp3_spark.operators.sketches import (
            bootstrap_revenue_ci,
        )

        rows = [
            (i, 1, 25.00, dt.datetime(2024, 1, 1)) for i in range(200)
        ]
        out = str(tmp_path / "sf")
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
        ).coalesce(1).write.parquet(f"{out}/orders.parquet")
        r = bootstrap_revenue_ci(spark, out).collect()[0]
        # every resample of a constant is the constant
        assert r.mean_cents == r.boot_lo_cents == r.boot_hi_cents == 2500.0

    def test_plan_is_one_scan_one_aggregation(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.sketches import (
            bootstrap_revenue_ci,
        )

        plan = (
            bootstrap_revenue_ci(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Scan parquet") == 1
        # global aggregate: partials combine map-side, no keyed exchange
        assert plan.count("Exchange hashpartitioning") == 0
