from data_quality_check_spark.sources.readers import (
    load,
    list_tables,
    read_csv,
    read_jdbc_query,
    read_parquet,
    s3_anonymous_conf,
    sniff_delimiter,
)

__all__ = [
    "load",
    "list_tables",
    "read_csv",
    "read_jdbc_query",
    "read_parquet",
    "s3_anonymous_conf",
    "sniff_delimiter",
]
