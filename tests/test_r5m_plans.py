"""Physical-plan locks for the r5k-r5m operators: the shapes that make
them viable at 100 TB must not silently regress (the test_r5d_ops
pattern — shuffle budgets and scan counts pinned)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestR5mPlans:
    def test_gini_one_exchange_one_scan(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.statistics import (
            revenue_gini,
        )

        plan = _plan(revenue_gini(spark, SF_DIR))
        assert plan.count("Scan parquet") == 1
        # customer agg exchange; the rank window's SinglePartition runs
        # on the aggregated frame, which is the documented trade-off
        assert plan.count("Exchange hashpartitioning") <= 1

    def test_cohort_ltv_sizes_derive_from_the_aggregated_frame(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.statistics import (
            cohort_ltv,
        )

        plan = _plan(cohort_ltv(spark, SF_DIR))
        # one corpus scan: the offset-0 size derivation must not
        # re-aggregate the orders table (was 2 scans / 5 exchanges)
        assert plan.count("Scan parquet") == 1
        assert plan.count("Exchange hashpartitioning") <= 3

    def test_daily_percentiles_share_one_day_exchange(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.statistics import (
            daily_value_percentiles,
        )

        plan = _plan(daily_value_percentiles(spark, SF_DIR))
        assert plan.count("Scan parquet") == 1
        # cume_dist window, conditional MINs, and the final groupBy all
        # cluster on the day key — one exchange serves them all
        assert plan.count("Exchange hashpartitioning") == 1
        assert plan.count("Exchange SinglePartition") == 0

    def test_heatmap_and_decomposition_stay_tiny(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.statistics import (
            seasonal_decomposition,
            weekday_hour_heatmap,
        )

        for fn, max_exch in ((weekday_hour_heatmap, 1), (seasonal_decomposition, 1)):
            plan = _plan(fn(spark, SF_DIR))
            assert plan.count("Scan parquet") == 1, fn.__name__
            assert (
                plan.count("Exchange hashpartitioning") <= max_exch
            ), fn.__name__

    def test_mi_matches_the_chisq_single_scan_contract(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.operators.analytics import (
            status_priority_mi,
        )

        plan = _plan(status_priority_mi(spark, SF_DIR))
        # marginals are windows over the aggregated cell frame, never a
        # re-aggregation of orders (the chisq plan-lock, inherited)
        assert plan.count("Scan parquet") == 1
