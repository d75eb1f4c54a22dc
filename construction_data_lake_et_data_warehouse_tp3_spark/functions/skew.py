"""Skew-handling patterns (SURVEY brief: 'skewed keys hurt … salting for
skew, AQE for runtime re-plan').

Two complementary mechanisms:

- AQE skew-join splitting is ON session-wide (session.RUNTIME_CONF) —
  joins with a pathological key get their oversized partitions split at
  runtime, no code changes.
- Salted two-phase aggregation (here) handles skewed GROUP BY keys,
  which AQE does not rebalance: phase 1 aggregates on (key, salt) so the
  hot key's rows spread over n_salts reducers; phase 2 combines the
  n_salts partials per key. Works for any algebraic aggregate
  (sum/count/min/max); avg is carried as (sum, count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "__salt") -> DataFrame:
    """Uniform random salt column (not seeded: salt placement never
    affects results, only balance)."""
    return df.withColumn(col_name, (F.rand() * n_salts).cast("int"))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase SUM/COUNT/AVG on potentially-skewed keys.

    Returns one row per key with total_<col>, count, avg_<col> — same
    results as a direct groupBy (asserted in tests), but the first
    shuffle distributes each hot key across n_salts partitions."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("__psum").alias(f"total_{value_col}"),
            F.sum("__pcnt").alias("count"),
            (F.sum("__psum") / F.sum("__pcnt")).alias(f"avg_{value_col}"),
        )
    )


def salted_join_keys(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Classic skew-join salting: left gets a random salt in [0, n),
    right is replicated n times (explode) so every (key, salt) pair
    matches. Use when one side has hot keys and the other is small-ish
    but above the broadcast threshold. Returns (left', right', join_keys).
    """
    salted_left = left.withColumn("__salt", (F.rand() * n_salts).cast("int"))
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left, replicated_right, [key, "__salt"]
