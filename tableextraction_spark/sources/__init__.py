from .media_parquet import detect_tables_python_scan, list_row_groups

__all__ = ["detect_tables_python_scan", "list_row_groups"]
