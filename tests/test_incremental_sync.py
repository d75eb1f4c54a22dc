"""CDC-driven incremental warehouse sync: applying the diff between two
lake snapshots must land the target in EXACTLY the state a from-scratch
full sync of the newer snapshot produces (the differential that justifies
replacing the reference's full re-sync)."""

from __future__ import annotations

from construction_data_lake_et_data_warehouse_tp3_spark.lake.transaction import (
    Lakehouse,
)
from construction_data_lake_et_data_warehouse_tp3_spark.warehouse.incremental import (
    apply_changes,
    delete_keys,
)
from construction_data_lake_et_data_warehouse_tp3_spark.warehouse.merge import (
    ParquetTable,
    merge_into,
)

KEYS = ("id",)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string, amount long")


def _rows(table):
    return sorted(
        tuple(r) for r in table.read().select("id", "v", "amount").collect()
    )


def _snapshots(spark, tmp_path):
    lh = Lakehouse(spark, str(tmp_path / "lh"))
    t1 = lh.begin()
    t1.write("facts", _df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]))
    s1 = t1.commit()
    t2 = lh.begin()
    t2.write("facts", _df(spark, [(2, "b", 20), (3, "c2", 31), (4, "d", 40)]))
    s2 = t2.commit()
    return lh, s1, s2


class TestIncrementalSync:
    def test_incremental_equals_full_resync(self, spark, tmp_path):
        lh, s1, s2 = _snapshots(spark, tmp_path)
        # target synced at s1
        target = ParquetTable(spark, str(tmp_path / "wh"))
        merge_into(target, lh.read("facts", s1), KEYS)
        # incremental apply of the s1→s2 interval
        out = apply_changes(lh, "facts", target, KEYS, s1, s2)
        assert out == {"upserted": 2, "deleted": 1}  # upd(3) + ins(4); del(1)
        # from-scratch full sync of s2
        fresh = ParquetTable(spark, str(tmp_path / "wh_full"))
        merge_into(fresh, lh.read("facts", s2), KEYS)
        assert _rows(target) == _rows(fresh)

    def test_reapply_is_idempotent(self, spark, tmp_path):
        lh, s1, s2 = _snapshots(spark, tmp_path)
        target = ParquetTable(spark, str(tmp_path / "wh"))
        merge_into(target, lh.read("facts", s1), KEYS)
        apply_changes(lh, "facts", target, KEYS, s1, s2)
        before = _rows(target)
        out = apply_changes(lh, "facts", target, KEYS, s1, s2)  # replay
        assert out["deleted"] == 0  # key 1 already gone
        assert _rows(target) == before

    def test_untouched_interval_is_noop(self, spark, tmp_path):
        lh, s1, s2 = _snapshots(spark, tmp_path)
        t3 = lh.begin()
        t3.write("other", _df(spark, [(9, "z", 0)]))
        s3 = t3.commit()
        target = ParquetTable(spark, str(tmp_path / "wh"))
        merge_into(target, lh.read("facts", s2), KEYS)
        before = _rows(target)
        assert apply_changes(lh, "facts", target, KEYS, s2, s3) == {
            "upserted": 0,
            "deleted": 0,
        }
        assert _rows(target) == before

    def test_delete_keys_missing_table_and_absent_keys(self, spark, tmp_path):
        absent = ParquetTable(spark, str(tmp_path / "nope"))
        some = _df(spark, [(1, "a", 1)])
        assert delete_keys(absent, some, KEYS) == 0
        target = ParquetTable(spark, str(tmp_path / "wh"))
        merge_into(target, _df(spark, [(5, "e", 5)]), KEYS)
        assert delete_keys(target, some, KEYS) == 0  # key 1 not present
        assert _rows(target) == [(5, "e", 5)]
