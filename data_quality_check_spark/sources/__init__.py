from data_quality_check_spark.sources.readers import (
    azure_blob_conf,
    gcs_conf,
    load,
    list_tables,
    read_csv,
    read_excel,
    read_http_csv,
    read_jdbc_query,
    read_parquet,
    s3_anonymous_conf,
    sniff_delimiter,
)

__all__ = [
    "azure_blob_conf",
    "gcs_conf",
    "load",
    "list_tables",
    "read_csv",
    "read_excel",
    "read_http_csv",
    "read_jdbc_query",
    "read_parquet",
    "s3_anonymous_conf",
    "sniff_delimiter",
]
