from redskins_rule_spark.sources.io import (
    read_csv,
    read_json,
    read_parquet,
    table,
    write_parquet,
)

__all__ = ["read_parquet", "read_csv", "read_json", "write_parquet", "table"]
