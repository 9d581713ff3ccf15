from fastetl_spark.io.readers import jdbc_scan_options, load_tables, read_table
from fastetl_spark.io.writers import write_csv, write_jdbc_options, write_parquet

__all__ = [
    "read_table",
    "load_tables",
    "jdbc_scan_options",
    "write_parquet",
    "write_csv",
    "write_jdbc_options",
]
