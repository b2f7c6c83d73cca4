from .readers import load_table, load_tables, read_viewing_log
from .writers import write_csv_single, write_parquet_partitioned

__all__ = [
    "load_table",
    "load_tables",
    "read_viewing_log",
    "write_csv_single",
    "write_parquet_partitioned",
]
