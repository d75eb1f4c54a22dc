"""Set-oriented MERGE/upsert for parquet-backed warehouse tables
(SURVEY §2.5 #32-38).

The reference upserts row-by-row over the network — one
`INSERT … ON DUPLICATE KEY UPDATE` per DataFrame row
(/root/reference/sync_to_mysql.py:133-232, iterrows at :237,263,287,304).
Here a MERGE is one distributed job:

    kept   = target LEFT ANTI updates ON keys     (rows not being updated)
    result = kept UNION updates                   (updated + inserted rows)

written with an atomic directory swap (write tmp → rename). Matched rows
are replaced wholesale, exactly like the reference's ON-DUPLICATE column
lists which update every non-key column (+ updated_at).

Scale notes:
- The anti-join shuffles on the merge keys only; with a small updates
  side Spark broadcasts it and the target scan never shuffles.
- Rewrite cost is O(target) per merge — the plain-parquet trade-off. At
  100 TB you partition the target (e.g. by snapshot_date) so the swap
  touches only affected partitions, or swap the storage layer for a
  Delta/Iceberg table where MERGE rewrites matched files only; the
  call-site API here stays the same.
- Exactly-once: merge is idempotent on keys — re-running the same batch
  yields the same table state (asserted in tests; upgrade over the
  reference's at-least-once consumer, SURVEY §2.9 #62).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class ParquetTable:
    """A parquet-backed managed table with overwrite-swap commits."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            name.endswith(".parquet") for name in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        """Commit df as the new table state via tmp-dir + atomic rename."""
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.isdir(old):
            shutil.rmtree(old)


def dedupe_updates(
    updates: DataFrame, keys: Sequence[str], order_by: str | None = None
) -> DataFrame:
    """Keep one row per key (latest by order_by desc, else arbitrary-but-
    deterministic via all-column ordering) — the reference applies updates
    in row order so 'last write wins' (sync_to_mysql.py:237)."""
    ordering = (
        [F.desc(order_by)] if order_by else [F.desc(c) for c in updates.columns]
    )
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


class SchemaMismatchError(ValueError):
    """Raised when updates are missing columns the target table carries —
    the explicit failure the reference lacks (its positional rename guard
    silently leaves integer column names on drift, sync_to_mysql.py:112;
    SURVEY §1.3 requires enforcement at the warehouse boundary)."""


def merge_into(
    table: ParquetTable,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: str | None = None,
    stamp_updated_at: bool = True,
) -> int:
    """MERGE updates into table on keys; returns number of upserted rows.

    Equivalent to `INSERT … ON DUPLICATE KEY UPDATE <all non-key cols>,
    updated_at = CURRENT_TIMESTAMP` (sync_to_mysql.py:137-142).

    Schema policy: updates may ADD columns (target backfills null) but may
    not DROP columns the target has — that's schema drift and raises."""
    missing_keys = [k for k in keys if k not in updates.columns]
    if missing_keys:
        raise SchemaMismatchError(f"updates missing merge key columns {missing_keys}")
    updates = dedupe_updates(updates, keys, order_by)
    if stamp_updated_at:
        updates = updates.withColumn("updated_at", F.current_timestamp())
    # the updates subtree (often a full aggregation pipeline) is consumed
    # twice — the row count and the result write; persist so it computes
    # once. current_timestamp is also frozen by this, so every written row
    # carries one stamp per merge. Keep a dedicated handle: the
    # updated_at-carry branch below REBINDS `updates`, and unpersisting
    # the rebound frame would leak the cached one for the session.
    updates = persisted = updates.persist()

    if table.exists():
        target = table.read()
        dropped = [
            c for c in target.columns if c not in updates.columns and c != "updated_at"
        ]
        if dropped:
            raise SchemaMismatchError(
                f"updates missing target columns {dropped}; explicit schema "
                f"evolution only (add columns, never silently drop)"
            )
        for col in updates.columns:  # schema evolution: add new columns as null
            if col not in target.columns:
                target = target.withColumn(col, F.lit(None).cast(updates.schema[col].dataType))
        if "updated_at" in target.columns and "updated_at" not in updates.columns:
            # stamp_updated_at=False on a previously-stamped target: carry
            # each matched row's EXISTING stamp forward (the reference's
            # ON DUPLICATE KEY UPDATE refreshes or preserves the stamp,
            # never nulls it — sync_to_mysql.py:137-142); genuinely new
            # rows were never stamped and stay null.
            existing = target.select(
                *keys, F.col("updated_at").alias("__prev_updated_at")
            )
            updates = (
                updates.join(existing, list(keys), "left")
                .withColumn("updated_at", F.col("__prev_updated_at"))
                .drop("__prev_updated_at")
            )
        # no broadcast hint: micro-batch updates auto-broadcast under the
        # session threshold, backfill-sized updates fall back to shuffle
        kept = target.select(*updates.columns).join(
            updates.select(*keys), list(keys), "left_anti"
        )
        result = kept.unionByName(updates)
    else:
        result = updates

    try:
        n = updates.count()
        table.overwrite(result)
    finally:
        persisted.unpersist()
    return n
