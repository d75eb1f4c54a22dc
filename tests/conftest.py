from __future__ import annotations

import pytest

from construction_data_lake_et_data_warehouse_tp3_spark.session import RUNTIME_CONF

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    import tempfile

    builder = (
        SparkSession.builder.appName("tp3-tests")
        .master("local[8]")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        # static conf: bucketed-table tests need a writable catalog dir
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="tp3_test_wh_"))
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    # 4 shuffle partitions: at sf0.001 every shuffle stage is scheduling-
    # bound, not data-bound — 8→4 cut the full-suite wall clock ~10% with
    # identical results (the engine itself runs 32+AQE in production)
    builder = builder.config("spark.sql.shuffle.partitions", "4")
    session = builder.getOrCreate()
    yield session
    session.stop()


@pytest.fixture(scope="session")
def plain_warehouse(spark, tmp_path_factory):
    """One parquet sync_warehouse pass at sf0.001, shared READ-ONLY by the
    JDBC-parity, atomic-parity, and replay tests — each full pass is ~8 s
    of micro-jobs, so sharing the baseline cuts three passes from the
    suite. A test that mutates warehouse state must copytree first."""
    from construction_data_lake_et_data_warehouse_tp3_spark.warehouse.star import (
        sync_warehouse,
    )

    root = str(tmp_path_factory.mktemp("shared_wh"))
    counts = sync_warehouse(spark, SF_DIR, root, snapshot_version=1)
    return root, counts
