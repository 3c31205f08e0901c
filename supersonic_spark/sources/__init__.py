"""Table sources/sinks: Iceberg-or-parquet seam and encoded-block files."""

from .table_io import load_table, table_fingerprint, write_table

__all__ = ["load_table", "table_fingerprint", "write_table"]
