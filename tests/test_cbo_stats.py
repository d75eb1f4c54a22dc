"""CBO statistics demo tests: ANALYZE populates catalog stats and the
optimizer uses them to fix a deliberately bad join order."""

from __future__ import annotations

from construction_data_lake_et_data_warehouse_tp3_spark.plans.cbo import (
    cbo_join_order_demo,
)

SF_DIR = "/root/testdata/sf0.01"


def test_cbo_reorders_bad_join_with_stats(spark):
    demo = cbo_join_order_demo(spark, SF_DIR)

    # ANALYZE recorded real row counts in the catalog
    assert demo["row_counts"]["nation"] == 25
    assert demo["row_counts"]["orders"] and demo["row_counts"]["orders"] > 10_000
    assert demo["reordered"], "stats + CBO left the bad join order unchanged"

    # without stats the plan keeps the written order: orders joins before
    # the nation dim subtree; with stats the filtered nation dim joins
    # customer FIRST and the big orders join moves last
    off, on = demo["plan_without_stats"], demo["plan_with_stats"]
    assert off.index("orders_stats") < off.index("nation_stats")
    assert on.index("nation_stats") < on.index("orders_stats")
    # conf restored
    assert spark.conf.get("spark.sql.cbo.enabled") == "false"
