"""AQE skew-join (OptimizeSkewedJoin): the runtime half of the skew
story — functions/skew.py salts by hand when the key is known in
advance; AQE splits oversized shuffle partitions at RUNTIME from actual
map output sizes, which is what saves the 100 TB join whose hot key
nobody predicted.  This pins that the mechanism engages: a planted
hot key must yield `SortMergeJoin(skew=true)` with a skewed
AQEShuffleRead in the final adaptive plan, with identical results.

Thresholds are lowered for the fixture-sized shuffle (defaults are
256 MB-scale); the MECHANISM, not the thresholds, is the lock — same
posture as test_runtime_filters.py."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.shuffle.partitions": "8",
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


def _skewed_join(spark):
    """Key 0 carries 500k padded rows (one hot shuffle partition); 1,000
    cold keys carry 10 rows each."""
    left = spark.range(500_000).select(
        F.lit(0).alias("k"), F.expr("repeat('x', 32)").alias("pad")
    ).union(
        spark.range(10_000).select(
            (F.col("id") % 1000 + 1).alias("k"), F.expr("'y'").alias("pad")
        )
    )
    right = spark.range(1001).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return left.join(right, "k")


class TestAqeSkewJoin:
    def test_hot_key_triggers_runtime_split(self, spark):
        with _confs(spark, _CONF):
            j = _skewed_join(spark)
            n = j.count()
            # executedPlan on the EXECUTED frame: AQE finalizes per action
            j.collect()
            plan = j._jdf.queryExecution().executedPlan().toString()
        assert n == 510_000  # 500k hot-key matches + 10k cold matches
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed

    def test_disabled_means_one_hot_partition(self, spark):
        off = dict(_CONF)
        off["spark.sql.adaptive.skewJoin.enabled"] = "false"
        with _confs(spark, off):
            j = _skewed_join(spark)
            rows = j.count()
            j.collect()
            plan = j._jdf.queryExecution().executedPlan().toString()
        assert rows == 510_000
        assert "SortMergeJoin(skew=true)" not in plan
