from .catalog import (
    NATIVE_ICEBERG_SCHEME,
    iceberg_available,
    is_path,
    read_table,
    write_table,
)
from .media_parquet import detect_tables_python_scan, list_row_groups

__all__ = [
    "detect_tables_python_scan",
    "list_row_groups",
    "NATIVE_ICEBERG_SCHEME",
    "iceberg_available",
    "is_path",
    "read_table",
    "write_table",
]
