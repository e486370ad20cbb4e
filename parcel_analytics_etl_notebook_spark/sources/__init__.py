from parcel_analytics_etl_notebook_spark.sources.readers import (
    load_tables,
    read_csv_multiline,
    read_json,
    read_parquet,
)
from parcel_analytics_etl_notebook_spark.sources.writers import (
    write_csv_audit,
    write_parquet,
)

__all__ = [
    "load_tables",
    "read_csv_multiline",
    "read_json",
    "read_parquet",
    "write_csv_audit",
    "write_parquet",
]
