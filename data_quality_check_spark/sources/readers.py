"""Source connectors — Spark-first equivalents of the reference's 8 loaders.

The reference (app_v3.py:694-742) loads one flat table per run via pandas:
CSV upload with delimiter sniffing, HTTP CSV, S3/Azure/GCS objects, Postgres /
MySQL queries, and a Databricks Delta table scan (app_v3.py:1234-1241). Here
every source is a `spark.read` plan so scans stay distributed, schema-pruned,
and filter-pushable; nothing is materialized on the driver.

Cloud object stores and JDBC need only a URL scheme / options — the same
`read_csv` / `read_parquet` works on `s3a://`, `abfss://`, `gs://` paths when
the corresponding Hadoop connector jars + credentials are on the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Candidate separators in the reference's sniffing order: it counted ';' vs ','
# in the first 4096 bytes (app_v3.py:697-700); we generalize to common cases.
_SEP_CANDIDATES = (",", ";", "\t", "|")


def sniff_delimiter(spark: SparkSession, path: str, sample_lines: int = 5) -> str:
    """Pick the CSV delimiter by counting candidates in the file head.

    Reads the first lines through `spark.read.text` (works on any Hadoop-
    supported filesystem — local, s3a, abfss, gs — unlike a driver-side open),
    and returns the candidate with the highest total count, ',' on ties.
    """
    head = spark.read.text(path).limit(sample_lines).collect()
    blob = "\n".join(r.value for r in head)
    counts = {sep: blob.count(sep) for sep in _SEP_CANDIDATES}
    return max(_SEP_CANDIDATES, key=lambda s: counts[s])


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str | None = None,
    header: bool = True,
    infer_schema: bool = True,
    schema=None,
) -> DataFrame:
    """CSV scan with sniffed-or-given delimiter.

    `infer_schema=True` matches the reference's pandas dtype inference; pass an
    explicit `schema` at scale to skip the extra inference pass over the data.
    """
    sep = sep or sniff_delimiter(spark, path)
    reader = spark.read.option("sep", sep).option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """Postgres/MySQL query scan (reference S7/S8: `pd.read_sql(query)`).

    `url` is a JDBC URL (jdbc:postgresql://…, jdbc:mysql://…). Pass
    `partition_column` + bounds + `num_partitions` for a parallel scan — the
    single-connection default is the JDBC bottleneck at any real scale.
    """
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in (("user", user), ("password", password), ("driver", driver)):
        if v is not None:
            reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions or 8)
        )
    elif num_partitions:
        reader = reader.option("numPartitions", num_partitions)
    return reader.load()


def s3_anonymous_conf(spark: SparkSession) -> None:
    """Configure anonymous S3 access (reference S4 read public buckets with
    botocore UNSIGNED; the s3a equivalent is the AnonymousAWSCredentialsProvider)."""
    spark.conf.set(
        "spark.hadoop.fs.s3a.aws.credentials.provider",
        "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider",
    )


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """Catalog table listing (reference S10: Unity-Catalog REST call)."""
    return [t.name for t in spark.catalog.listTables(database)]


_EXT_READERS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".orc": "orc",
}


def load(spark: SparkSession, source: str, **options) -> DataFrame:
    """Extension-dispatch facade (reference `load_data`, app_v3.py:694-742).

    `source` is a path/URL (format picked by extension, CSV delimiter sniffed),
    or a catalog table name when it has no recognized extension.
    """
    low = source.lower()
    for ext, fmt in _EXT_READERS.items():
        if low.endswith(ext):
            if fmt == "csv":
                return read_csv(spark, source, **options)
            return spark.read.format(fmt).options(**options).load(source)
    return spark.table(source)
