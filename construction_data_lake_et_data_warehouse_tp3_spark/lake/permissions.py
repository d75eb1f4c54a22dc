"""Folder-path permissions (SURVEY §2.11 #79, §4 custom item 3).

Rebuilds /root/reference/permissions_manager.py as an engine-managed
parquet table + MERGE grant (unique key (user_email, folder_path,
permission_type), :28) and an enforcement hook the path-access layer
calls before resolving a feed path — the reference stores grants but
never enforces them; the hook is the missing half.

Expiry: a grant with expires_at < today is inactive (checked at read
time, matching the `expires_at DATE NULL` column, :26).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..warehouse.merge import ParquetTable, merge_into

PERMISSION_TYPES = ("read", "write", "admin")  # ENUM permissions_manager.py:23

SCHEMA = T.StructType(
    [
        T.StructField("user_email", T.StringType(), False),
        T.StructField("folder_path", T.StringType(), False),
        T.StructField("permission_type", T.StringType(), False),
        T.StructField("granted_by", T.StringType(), False),
        T.StructField("granted_at", T.TimestampType(), True),
        T.StructField("expires_at", T.DateType(), True),
        T.StructField("is_active", T.BooleanType(), True),
    ]
)

KEYS = ("user_email", "folder_path", "permission_type")


class PermissionsManager:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.table = ParquetTable(spark, path)

    # grant upsert (#37, permissions_manager.py:48-59)
    def grant(
        self,
        user_email: str,
        folder_path: str,
        permission_type: str,
        granted_by: str,
        expires_at: date | None = None,
    ) -> None:
        if permission_type not in PERMISSION_TYPES:
            raise ValueError(
                f"permission_type must be one of {PERMISSION_TYPES}, got {permission_type!r}"
            )
        row = self.spark.createDataFrame(
            [(user_email, folder_path, permission_type, granted_by, None, expires_at, True)],
            SCHEMA,
        ).withColumn("granted_at", F.current_timestamp())
        merge_into(self.table, row, KEYS, stamp_updated_at=False)

    def revoke(self, user_email: str, folder_path: str, permission_type: str) -> None:
        """Flip is_active=FALSE (the reference has no revoke; the flag at
        permissions_manager.py:27 implies this operation)."""
        row = self.spark.createDataFrame(
            [(user_email, folder_path, permission_type, "revoke", None, None, False)],
            SCHEMA,
        ).withColumn("granted_at", F.current_timestamp())
        merge_into(self.table, row, KEYS, stamp_updated_at=False)

    # ordered listing (#40, permissions_manager.py:62)
    def list(self) -> DataFrame:
        return self.table.read().orderBy("user_email", "folder_path")

    def check(self, user_email: str, folder_path: str, permission_type: str) -> bool:
        """Enforcement hook: active, unexpired grant for the folder or an
        'admin' grant on a parent folder."""
        if not self.table.exists():
            return False
        grants = self.table.read().where(
            (F.col("user_email") == user_email)
            & F.col("is_active")
            & (F.col("expires_at").isNull() | (F.col("expires_at") >= F.current_date()))
        )
        direct = grants.where(
            (F.col("folder_path") == folder_path)
            & (F.col("permission_type").isin(permission_type, "admin"))
        )
        if direct.limit(1).count() > 0:
            return True
        # parent admin grants match on a path-separator boundary: a grant
        # on '/lake/a' covers '/lake/a' and '/lake/a/...' but NOT the
        # sibling '/lake/ab' (a raw prefix match would).
        parents = grants.where(
            (F.col("permission_type") == "admin")
            & (
                (F.col("folder_path") == folder_path)
                | F.lit(folder_path).startswith(
                    F.concat(
                        F.regexp_replace(F.col("folder_path"), "/+$", ""), F.lit("/")
                    )
                )
            )
        )
        return parents.limit(1).count() > 0


class PermissionError_(Exception):
    pass


def enforce(perms: PermissionsManager, user_email: str, folder_path: str, mode: str) -> None:
    if not perms.check(user_email, folder_path, mode):
        raise PermissionError_(f"{user_email} lacks {mode!r} on {folder_path}")
