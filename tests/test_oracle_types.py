"""Strict TYPE parity between each oracle and its Spark query.

The driver's value hash is type-sensitive in one specific way the local
parity test (which normalizes Decimal→float) cannot see: DuckDB's
sum(INTEGER) returns HUGEINT, which surfaces as float through the
driver's Arrow path while Spark returns BIGINT — identical values, hash
mismatch (the r4 `length_histogram` failure). This test compares the
DuckDB result's Arrow column types against the Spark schema for every
oracle-backed query at sf0.001 and fails on any int/float/decimal family
mismatch — so an uncast integer sum can never again reach the driver.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

ORACLES = entry_mod.oracle_sql()
QUERY_NAMES = sorted(ORACLES.keys())


def _family(t) -> str:
    """Collapse a type into the hash-relevant family."""
    if isinstance(t, str):  # Spark simpleString
        if t in ("tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"):
            return "int"
        if t in ("float", "double"):
            return "float"
        if t.startswith("decimal"):
            return "decimal"
        if t in ("string", "varchar"):
            return "str"
        if t.startswith("timestamp"):
            return "timestamp"
        return t
    # pyarrow DataType
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


GRANULAR = bool(os.environ.get("PARITY_GRANULAR"))

_LOCAL = __import__("threading").local()


def _duck():
    con = getattr(_LOCAL, "con", None)
    if con is None:
        con = duckdb.connect()
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
            )
        _LOCAL.con = con
    return con


def _check_types(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    spark_types = {f.name: _family(f.dataType.simpleString()) for f in df.schema.fields}

    # LIMIT 0 subquery: only the result SCHEMA matters here, and DuckDB
    # can derive it without executing the oracle
    tbl = _duck().execute(
        f"SELECT * FROM ({ORACLES[name]}) __t LIMIT 0"
    ).fetch_arrow_table()
    duck_types = {f.name: _family(f.type) for f in tbl.schema}

    assert set(spark_types) == set(duck_types), (
        f"{name}: column sets differ spark={sorted(spark_types)} duck={sorted(duck_types)}"
    )
    mismatched = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
        # int128 (HUGEINT) IS integer in Arrow ≥ its family; the killer
        # combos are int-vs-float / int-vs-decimal / float-vs-decimal —
        # anything where the driver's value rendering differs
        and {spark_types[c], duck_types[c]} & {"int", "float", "decimal"}
    }
    assert not mismatched, f"{name}: type-family mismatches {mismatched}"


@pytest.mark.skipif(
    GRANULAR, reason="PARITY_GRANULAR=1 runs the per-query form instead"
)
def test_all_oracle_types_pooled(spark):
    """Whole-registry type-family sweep through a thread pool (the
    test_oracle_parity pattern); every mismatching query named."""
    from concurrent.futures import ThreadPoolExecutor

    failures = []

    def run(name):
        try:
            _check_types(spark, name)
        except Exception as exc:  # noqa: BLE001 - aggregate, then fail
            failures.append(f"{name}: {type(exc).__name__}: {exc}")

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(run, QUERY_NAMES))
    assert not failures, (
        f"{len(failures)}/{len(QUERY_NAMES)} type mismatches:\n"
        + "\n".join(sorted(failures))
    )


@pytest.mark.parametrize("name", QUERY_NAMES if GRANULAR else QUERY_NAMES[:1])
def test_oracle_types_match_spark(spark, name):
    """Per-query form under PARITY_GRANULAR=1; one representative query
    keeps the path exercised otherwise."""
    _check_types(spark, name)
