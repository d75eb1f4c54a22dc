"""Runtime bloom-filter injection (Catalyst's InjectRuntimeFilter): when
a selective dim filter feeds a SHUFFLE join, Spark builds a bloom filter
from the dim side's join keys at runtime and pushes a might_contain()
probe into the fact side's scan — at 100 TB this prunes the fact rows
BEFORE they shuffle, which is exactly the win broadcast joins get for
free and shuffle joins otherwise lose.  The engine relies on this for
big-dim joins that exceed the broadcast threshold, so the injection
must not silently regress.

Size thresholds are lowered for the sf0.001 fixture (the defaults gate
injection on a 10 GB application-side scan); production keeps the
defaults — the test pins the MECHANISM, not the thresholds.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@contextmanager
def _confs(spark, overrides):
    saved = {}
    for k, v in overrides.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _join(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").where(
        "c_mktsegment = 'BUILDING'"
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestRuntimeBloomFilter:
    def test_fact_side_gets_might_contain_probe(self, spark):
        with _confs(spark, _CONF):
            plan = _plan(_join(spark))
        # the dim side aggregates a bloom filter from its join keys...
        assert "bloom_filter_agg" in plan
        # ...and the fact side probes it BEFORE the shuffle
        assert "might_contain" in plan
        fact_filter = next(
            line
            for line in plan.splitlines()
            if "might_contain" in line and "o_custkey" in line
        )
        assert "xxhash64(o_custkey" in fact_filter

    def test_disabled_means_no_probe(self, spark):
        off = dict(_CONF)
        off["spark.sql.optimizer.runtime.bloomFilter.enabled"] = "false"
        with _confs(spark, off):
            plan = _plan(_join(spark))
        assert "might_contain" not in plan

    def test_filtered_result_is_unchanged(self, spark):
        with _confs(spark, _CONF):
            pruned = {tuple(r) for r in _join(spark).collect()}
        baseline = {tuple(r) for r in _join(spark).collect()}
        assert pruned == baseline and pruned  # non-empty, identical
