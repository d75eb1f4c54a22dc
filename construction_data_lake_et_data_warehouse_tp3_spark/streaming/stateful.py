"""Custom stateful streaming operator: session windows via
applyInPandasWithState (SURVEY brief — "applyInPandasWithState for custom
stateful operators").

The reference's ksqlDB tables are unwindowed running aggregates;
sessionization (gap-delimited activity windows) is the canonical
semantics its engine CANNOT express and Spark has no built-in streaming
primitive for either — this is the (b) tier of the custom-operator
ladder: Arrow-batched pandas state function, not a row-at-a-time UDF.

Semantics per user_id:
- events extend the open session while the gap to the previous event is
  ≤ gap_seconds;
- a larger gap CLOSES the session (emitted downstream) and opens a new
  one;
- an idle user's open session is flushed by processing-time timeout, so
  state is bounded: one open session per active key, gone after
  idle_timeout_ms.

Scale notes: state lives in the state store keyed by user_id (RocksDB
provider in production), shuffled once per micro-batch on the group key;
per-key state is O(1) — four scalars — regardless of event volume, and
emitted rows are closed sessions only (no per-event amplification).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.DoubleType()),
        T.StructField("session_end", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # 'gap' | 'timeout'
    ]
)

#: open-session state: (start_epoch, last_epoch, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.DoubleType()),
        T.StructField("last", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
    gap_seconds: float,
    idle_timeout_seconds: float,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, start, last, n, "timeout"]], columns=SESSION_SCHEMA.names
        )
        return

    times: list[float] = []
    for pdf in batches:
        times.extend(float(v) for v in pdf["epoch"])
    times.sort()

    start, last, n = state.get if state.exists else (None, None, 0)
    closed: list[list] = []
    for t in times:
        if start is None:
            start, last, n = t, t, 1
        elif t - last <= gap_seconds:
            last, n = t, n + 1
        else:
            closed.append([user_id, start, last, n, "gap"])
            start, last, n = t, t, 1
    state.update((start, last, n))
    # flush the open session once the user goes idle in processing time
    # (coarse by design: processing-time timeouts fire on a later batch,
    # not at the exact instant)
    state.setTimeoutDuration(int(idle_timeout_seconds * 1000))
    if closed:
        yield pd.DataFrame(closed, columns=SESSION_SCHEMA.names)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    idle_timeout_seconds: float | None = None,
) -> DataFrame:
    """Gap-based session windows over a stream with columns
    (user_id: long, epoch: double seconds). Emits CLOSED sessions only;
    open sessions live in the state store until a gap or idle timeout
    (default 2 gaps of processing time) closes them. Output mode must be
    'update' or 'append'."""
    idle = idle_timeout_seconds if idle_timeout_seconds is not None else gap_seconds * 2
    import os

    # closure string, pickled by value — lets workers import this module
    # even when the launcher's cwd/PYTHONPATH doesn't include the repo
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    def fn(key, pdfs, state):
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        from construction_data_lake_et_data_warehouse_tp3_spark.streaming.stateful import (
            _sessionize_group,
        )

        yield from _sessionize_group(key, pdfs, state, gap_seconds, idle)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
