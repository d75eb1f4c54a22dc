from .merge import ParquetTable, merge_into  # noqa: F401
from .star import WAREHOUSE_TABLES, sync_warehouse  # noqa: F401
