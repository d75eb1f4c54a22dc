"""Differential tests mirroring the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, then compare row count, column names, and order-insensitive
values (SURVEY §5 item 1). Any failure here would fail CORRECTNESS_r{N}.

Two execution modes, identical comparisons either way:

- default: ONE pooled test drives all queries through a thread pool
  (Spark schedules concurrent jobs from multiple submitter threads; one
  DuckDB connection per thread) and reports every failing query by name
  — the plan-lint pattern, ~4-5× less wall clock than per-test runs
  because the scheduler idle time between micro-jobs overlaps.
- PARITY_GRANULAR=1: the per-query parametrized form, for bisecting a
  single failure with pytest -k.
"""

from __future__ import annotations

import datetime
import os
import math
import threading
from concurrent.futures import ThreadPoolExecutor

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
GRANULAR = bool(os.environ.get("PARITY_GRANULAR"))
POOL = int(os.environ.get("PARITY_POOL", "8"))
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


_LOCAL = threading.local()


def _duck_connection():
    con = getattr(_LOCAL, "con", None)
    if con is None:
        con = duckdb.connect()
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
            )
        _LOCAL.con = con
    return con


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # tolerate last-ulp noise between engines beyond our explicit rounding
        return round(value, 6)
    if isinstance(value, datetime.datetime):
        return value.isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    try:  # Decimal → float
        import decimal

        if isinstance(value, decimal.Decimal):
            return round(float(value), 6)
    except ImportError:
        pass
    return value


def _row_set(rows, columns):
    # None-safe total order: rollup/cube/outer-join results mix NULLs and
    # values in one column, and tuple sort would TypeError when a tie
    # reaches the NULL — the sort key only affects ordering, equality of
    # the sorted lists is unchanged
    return sorted(
        (tuple(_normalize(v) for v in row) for row in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    ), list(columns)


QUERY_NAMES = sorted(entry_mod.queries().keys())
ORACLES = entry_mod.oracle_sql()


def assert_driver_canonicalizable(name, schema):
    """The driver's correctness gate canonicalizes results with a pandas
    sort over EVERY column; array/map/struct cells are unhashable there
    (numpy.ndarray TypeError — the r5 feature_hashing/jl_projection/
    inverted_index ERRs). Reject complex-typed output columns locally so
    local green always implies driver green."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: driver-uncanonicalizable output columns {bad} "
        f"(array/map/struct) — emit a deterministic scalar form "
        f"(e.g. array_join CSV) instead"
    )


def _check_query(spark, name):
    """The full driver-gate comparison for one query; raises on mismatch."""
    fn = entry_mod.queries()[name]
    df = fn(spark, SF_DIR)
    assert_driver_canonicalizable(name, df.schema)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns

    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only check (approximate operators)
        return

    con = _duck_connection()
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    # compare values with columns aligned by sorted name (driver semantics)
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_set, _ = _row_set([[r[i] for i in s_idx] for r in spark_rows], sorted(spark_cols))
    d_set, _ = _row_set([[r[i] for i in d_idx] for r in duck_rows], sorted(duck_cols))
    assert len(s_set) == len(d_set), (
        f"{name}: row count spark={len(s_set)} duck={len(d_set)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.skipif(
    GRANULAR, reason="PARITY_GRANULAR=1 runs the per-query form instead"
)
def test_all_queries_match_oracle_pooled(spark):
    """The whole registry through a thread pool — every comparison the
    parametrized form makes, one wall-clock-efficient test; failures
    list every broken query by name."""
    failures = []

    def run(name):
        try:
            _check_query(spark, name)
        except Exception as exc:  # noqa: BLE001 - aggregate, then fail
            failures.append(f"{name}: {type(exc).__name__}: {exc}")

    with ThreadPoolExecutor(max_workers=POOL) as pool:
        list(pool.map(run, QUERY_NAMES))
    assert not failures, (
        f"{len(failures)}/{len(QUERY_NAMES)} queries diverged "
        f"(PARITY_GRANULAR=1 + pytest -k <name> to bisect):\n"
        + "\n".join(sorted(failures))
    )


@pytest.mark.parametrize(
    "name", QUERY_NAMES if GRANULAR else QUERY_NAMES[:1]
)
def test_query_matches_oracle(spark, name):
    """Per-query form: full sweep under PARITY_GRANULAR=1 (for -k
    bisection); otherwise one representative query keeps the path
    itself exercised."""
    _check_query(spark, name)


def test_harness_rejects_array_columns(spark):
    """The r5 divergence class, locked dead: a frame with an array-typed
    output column must be flagged by the local harness (the driver's
    pandas canonicalizer would die on it)."""
    df = spark.createDataFrame([(1, [1, 2])], "id int, xs array<int>")
    with pytest.raises(AssertionError, match="xs"):
        assert_driver_canonicalizable("fake_query", df.schema)
    ok = spark.createDataFrame([(1, "1,2")], "id int, xs string")
    assert_driver_canonicalizable("fake_query", ok.schema)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
