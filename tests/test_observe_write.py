"""Write-time expectations (lake/observe.py): violation counts must be
exact, metered inside the write job (one scan — plan-locked), failures
must report every check after the data landed, and a clean frame must
pass untouched."""

from __future__ import annotations

import pytest

from construction_data_lake_et_data_warehouse_tp3_spark.lake.observe import (
    ExpectationError,
    checked_write,
)

CHECKS = {
    "amount_positive": "amount > 0",
    "kind_known": "kind IN ('a', 'b')",
}


def _frame(spark, rows):
    return spark.createDataFrame(rows, "id long, amount double, kind string")


class TestCheckedWrite:
    def test_clean_frame_writes_with_zero_violations(self, spark, tmp_path):
        df = _frame(spark, [(1, 5.0, "a"), (2, 1.0, "b")])
        out = str(tmp_path / "t")
        m = checked_write(df, out, CHECKS)
        assert m == {"n_rows": 2, "amount_positive": 0, "kind_known": 0}
        assert spark.read.parquet(out).count() == 2

    def test_violations_counted_exactly_and_raise_after_write(self, spark, tmp_path):
        df = _frame(
            spark,
            [(1, 5.0, "a"), (2, -1.0, "b"), (3, 0.0, "zz"), (4, 2.0, "zz")],
        )
        out = str(tmp_path / "t")
        with pytest.raises(ExpectationError) as exc:
            checked_write(df, out, CHECKS)
        assert exc.value.metrics == {
            "n_rows": 4,
            "amount_positive": 2,  # -1.0 and 0.0
            "kind_known": 2,  # the two 'zz'
        }
        # fail mode quarantines AFTER the write — data is inspectable
        assert spark.read.parquet(out).count() == 4

    def test_count_mode_returns_metrics_without_raising(self, spark, tmp_path):
        df = _frame(spark, [(1, -5.0, "a")])
        m = checked_write(df, str(tmp_path / "t"), CHECKS, on_violation="count")
        assert m["amount_positive"] == 1 and m["kind_known"] == 0

    def test_single_scan_plan(self, spark, tmp_path):
        """The metered write must not re-scan: one CollectMetrics node,
        no second pass over the source."""
        src = str(tmp_path / "src")
        _frame(spark, [(i, float(i + 1), "a") for i in range(100)]).write.parquet(src)
        df = spark.read.parquet(src)
        from pyspark.sql import functions as F
        from pyspark.sql.observation import Observation

        obs = Observation("x")
        metered = df.observe(
            obs, F.count(F.lit(1)).alias("n_rows")
        )
        plan = metered._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 1
        assert "CollectMetrics" in plan


    def test_empty_frame_reports_zero_not_crash(self, spark, tmp_path):
        """sum() observes NULL over zero rows; the metrics dict must
        coalesce to {'n_rows': 0, ...} (ADVICE r5: empty micro-batch on
        the ingest path crashed with TypeError after the write)."""
        df = _frame(spark, [])
        m = checked_write(df, str(tmp_path / "t"), CHECKS)
        assert m == {"n_rows": 0, "amount_positive": 0, "kind_known": 0}
