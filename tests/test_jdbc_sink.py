"""JDBC warehouse escape-hatch contract tests (VERDICT r1 §Missing #2).

No JDBC driver ships in this container, so the fake sits at the exact
API boundary JdbcTable uses — DataFrameReader.jdbc / DataFrameWriter.jdbc
— recording every write (url, table, rows) into an in-memory store and
serving reads back from it. Everything above that boundary (JdbcTable,
merge_into, every sync_* function) is the real production code path.

Contract proven:
- sync_warehouse(mode="jdbc") lands the SAME rows in every table as the
  parquet MERGE path (modulo the updated_at stamp);
- re-running the sync is idempotent (merge keys dedupe through the JDBC
  read → anti-join → overwrite cycle);
- the wiring targets the configured url and the six reference tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

from construction_data_lake_et_data_warehouse_tp3_spark.warehouse.jdbc import DDL
from construction_data_lake_et_data_warehouse_tp3_spark.warehouse.star import (
    WAREHOUSE_TABLES,
    Warehouse,
    sync_warehouse,
)

SF_DIR = "/root/testdata/sf0.001"
URL = "jdbc:mysql://warehouse-host:3306/tp3"


@pytest.fixture
def jdbc_fake(spark, monkeypatch):
    store: dict[tuple[str, str], tuple[list, object]] = {}
    writes: list[tuple[str, str, int]] = []

    def fake_read_jdbc(self, url, table, properties=None, **kwargs):
        if (url, table) not in store:
            raise Exception(f"Table or view not found: {table}")
        rows, schema = store[(url, table)]
        return spark.createDataFrame(rows, schema)

    def fake_write_jdbc(self, url, table, mode=None, properties=None):
        df = self._df
        rows = df.collect()
        store[(url, table)] = (rows, df.schema)
        writes.append((url, table, len(rows)))

    monkeypatch.setattr(DataFrameReader, "jdbc", fake_read_jdbc)
    monkeypatch.setattr(DataFrameWriter, "jdbc", fake_write_jdbc)
    return store, writes


def _rows_sans_stamp(df):
    cols = sorted(c for c in df.columns if c != "updated_at")
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_jdbc_sync_matches_parquet_path_and_is_idempotent(
    spark, tmp_path, jdbc_fake, plain_warehouse
):
    """One flow, both contracts (merged from two tests — each sync is
    ~8 s of micro-jobs, and the idempotence re-sync can reuse the same
    JDBC state the parity check just built). The parquet baseline comes
    from the shared session fixture (read-only here)."""
    store, writes = jdbc_fake
    parquet_root, parquet_out = plain_warehouse
    jdbc_out = sync_warehouse(
        spark, SF_DIR, str(tmp_path / "unused"), mode="jdbc", jdbc_url=URL
    )
    assert jdbc_out == parquet_out  # same per-table merge counts

    parquet_wh = Warehouse(spark, parquet_root)
    jdbc_wh = Warehouse(spark, str(tmp_path / "unused2"), mode="jdbc", jdbc_url=URL)
    first = {}
    for name in WAREHOUSE_TABLES:
        first[name] = _rows_sans_stamp(jdbc_wh.read(name))
        assert first[name] == _rows_sans_stamp(
            parquet_wh.read(name)
        ), f"row divergence in {name}"

    assert {t for (_, t, _) in writes} == set(WAREHOUSE_TABLES)
    assert all(u == URL for (u, _, _) in writes)

    # replay the jdbc sync into the same store: merge keys dedupe
    sync_warehouse(spark, SF_DIR, str(tmp_path / "unused"), mode="jdbc", jdbc_url=URL)
    for name in WAREHOUSE_TABLES:
        again = _rows_sans_stamp(jdbc_wh.read(name))
        assert again == first[name], f"{name} not idempotent"


def test_ddl_covers_every_sync_table_and_key():
    for name, keys in WAREHOUSE_TABLES.items():
        ddl = DDL[name]
        assert f"CREATE TABLE IF NOT EXISTS {name}" in ddl
        for key in keys:
            assert key in ddl
        assert "PRIMARY KEY" in ddl


def test_jdbc_mode_requires_url(spark):
    with pytest.raises(ValueError, match="jdbc_url"):
        Warehouse(spark, "/tmp/nope", mode="jdbc")
