"""Single-row robustness: EVERY registry query must execute cleanly over
tables holding exactly ONE row each (FK-consistent) — the non-empty
sibling of the zero-row sweep. Empty input exercises the no-groups path;
a SINGLETON exercises the zero-variance / single-group / n-1 paths where
ANSI-mode division-by-zero hides (revenue_acf crashed exactly here in r7
before its guard: one day of data makes the variance denominator 0 while
still producing rows). Pooled like the parity sweep; every failing query
named."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def singleton_dir(spark, tmp_path_factory):
    """One FK-consistent row per table, sliced from the real testdata so
    every key that should resolve does: the first lineitem row pins the
    order/part/supplier, the order pins the customer, and so on up the
    star. Queries that scan a single table see exactly one row; joins see
    exactly one matching row; aggregations see one group of size one."""
    dst = str(tmp_path_factory.mktemp("sf_one"))
    li = spark.read.parquet(f"{SRC}/lineitem.parquet").limit(1).collect()[0]
    keep = {
        "lineitem": f"l_orderkey = {li.l_orderkey} AND l_partkey = {li.l_partkey}"
        f" AND l_linenumber = {li.l_linenumber}",
        "orders": f"o_orderkey = {li.l_orderkey}",
        "part": f"p_partkey = {li.l_partkey}",
        "supplier": f"s_suppkey = {li.l_suppkey}",
    }
    orders = (
        spark.read.parquet(f"{SRC}/orders.parquet").where(keep["orders"]).collect()
    )
    custkey = orders[0].o_custkey
    cust = (
        spark.read.parquet(f"{SRC}/customer.parquet")
        .where(f"c_custkey = {custkey}")
        .collect()
    )
    nationkey = cust[0].c_nationkey
    keep["customer"] = f"c_custkey = {custkey}"
    keep["nation"] = f"n_nationkey = {nationkey}"
    nat = (
        spark.read.parquet(f"{SRC}/nation.parquet")
        .where(keep["nation"])
        .collect()
    )
    keep["region"] = f"r_regionkey = {nat[0].n_regionkey}"
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        picked = df.where(keep[t]) if t in keep else df.limit(1)
        picked.limit(1).coalesce(1).write.parquet(f"{dst}/{t}.parquet")
    return dst


def test_every_query_survives_singleton_tables(spark, singleton_dir):
    failures = []

    def run(item):
        name, fn = item
        try:
            fn(spark, singleton_dir).count()
        except Exception as exc:  # noqa: BLE001 - aggregate, then fail
            failures.append(f"{name}: {type(exc).__name__}: {exc}")

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(run, sorted(entry_mod.queries().items())))
    assert not failures, (
        f"{len(failures)} queries crash on single-row input:\n"
        + "\n".join(sorted(failures))
    )
