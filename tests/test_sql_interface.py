"""The SQL-string entry point: the same engine surface is reachable via
`spark.sql` over `register_views` (the reference's users write ksqlDB SQL
strings — export_to_data_lake.py:81-94 — so the rebuilt engine must take
SQL text, not just DataFrame calls). Each SQL result must match the
DataFrame-API twin row-for-row — same Catalyst plan space, two front
ends."""

from __future__ import annotations

import pytest

from construction_data_lake_et_data_warehouse_tp3_spark.operators import tpch
from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import (
    register_views,
)

SF_DIR = "/root/testdata/sf0.001"

Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                    AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                             AS sum_charge,
           round(avg(l_quantity), 2)                         AS avg_qty,
           round(avg(l_extendedprice), 2)                    AS avg_price,
           round(avg(l_discount), 4)                         AS avg_disc,
           count(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= date '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


class TestSqlInterface:
    @pytest.fixture(autouse=True)
    def _views(self, spark):
        register_views(spark, SF_DIR)

    def test_q1_sql_matches_dataframe_twin(self, spark):
        """Money columns tolerate last-cent rounding differences (the
        DataFrame twin uses fixed-point money_sum; plain SQL rounds
        doubles) — grouping keys, counts, and quantities must be exact."""
        sql = spark.sql(Q1_SQL)
        df = tpch.tpch_q1(spark, SF_DIR)
        exact = ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
        assert _rows(sql, exact) == _rows(df, exact)
        money = {r[:2]: r[2:] for r in _rows(sql, exact[:2] + ["sum_base_price", "avg_price"])}
        for r in _rows(df, exact[:2] + ["sum_base_price", "avg_price"]):
            s = money[r[:2]]
            assert all(abs(a - b) <= 0.011 for a, b in zip(r[2:], s))

    def test_adhoc_sql_over_views(self, spark):
        """Plain ad-hoc SQL works over every registered view and agrees
        with the DataFrame aggregation on the same table."""
        from pyspark.sql import functions as F
        from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import (
            load_table,
        )

        sql_rows = _rows(
            spark.sql(
                "SELECT o_custkey AS user_id, count(*) AS n FROM orders GROUP BY 1"
            ),
            ["user_id", "n"],
        )
        df_rows = _rows(
            load_table(spark, SF_DIR, "orders")
            .groupBy(F.col("o_custkey").alias("user_id"))
            .agg(F.count("*").alias("n")),
            ["user_id", "n"],
        )
        assert sql_rows == df_rows

    def test_sql_plan_gets_pushdown_too(self, spark):
        """The SQL front end hits the same Catalyst: a filtered SQL scan
        must show pushed filters exactly like the DataFrame path."""
        from construction_data_lake_et_data_warehouse_tp3_spark.plans import (
            pushed_filters,
        )

        df = spark.sql(
            "SELECT o_orderkey FROM orders WHERE o_totalprice > 100000.0"
        )
        assert any("o_totalprice" in f for f in pushed_filters(df))
