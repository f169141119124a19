from redskins_rule_spark.sources.io import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    table,
    write_parquet,
    write_table,
)

__all__ = ["read_parquet", "read_csv", "read_json", "write_parquet", "write_table", "read_orc", "table"]
