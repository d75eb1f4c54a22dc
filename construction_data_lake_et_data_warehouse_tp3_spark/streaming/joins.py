"""Watermarked stream-stream joins — the last Structured Streaming
primitive the surface was missing (the reference joins only via ksqlDB
pull queries against materialized tables; a true streaming pipeline
correlates two live feeds, e.g. transactions against their settlement
acks, without landing either first).

Semantics: inner equi-join on `key` with the right event constrained to
[left_time, left_time + max_delay]. Both sides carry a watermark, which
is what BOUNDS THE JOIN STATE — Spark keeps a row only until the other
side's watermark passes its eligibility window, so state is O(in-flight
window), not O(stream history). Without the time bound + watermarks a
stream-stream inner join would buffer both streams forever.

Scale notes: the join is a StreamingSymmetricHashJoin shuffled on `key`
on both sides — at 1000 executors each key's in-flight window lives on
one partition; skewed keys behave like any skewed shuffle (salt upstream
if one key dominates). `max_delay` directly prices state size: widen it
and every partition holds proportionally more in-flight rows."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    max_delay: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join two STREAMING DataFrames: right rows within
    [left_time, left_time + max_delay] of their matching left row.
    Column names are preserved with `l_`/`r_` disambiguation only for
    the timestamps; the key appears once."""
    l = left.withWatermark(left_time, watermark).alias("l")
    r = right.withWatermark(right_time, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
        & (
            F.col(f"r.{right_time}")
            <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = l.join(r, cond, "inner")
    keep = [F.col(f"l.{key}").alias(key)]
    keep += [
        F.col(f"l.{c}").alias(c)
        for c in left.columns
        if c != key
    ]
    keep += [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}")
        for c in right.columns
        if c != key
    ]
    return joined.select(*keep)


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key_left: str,
    key_right: str,
    how: str = "left",
) -> DataFrame:
    """Stream-STATIC dimension enrichment — the other canonical streaming
    join: a live fact feed decorated with a batch dim table (the
    reference does this per row over MySQL, sync_to_mysql.py:146-152; in
    Structured Streaming the static side is simply joined and re-read
    per micro-batch, so a dim refresh lands on the NEXT batch without
    restarting the query).

    The dim side carries a broadcast hint: stream-static joins cannot
    shuffle the streaming side into a sort-merge join anyway, and the
    hint pins the plan to BroadcastHashJoin even when stats are missing.
    Default LEFT join keeps unmatched stream rows (null dim columns) —
    FK misses flow through for downstream quarantine rather than
    silently dropping revenue events (SURVEY §7 risk 1)."""
    cond = F.col(key_left) == F.col(key_right)
    return stream.join(F.broadcast(dim), cond, how)
