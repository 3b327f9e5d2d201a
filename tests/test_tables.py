"""TableIO tests on the Parquet fallback backend (no Iceberg jar in sandbox)."""

import pytest
from pyspark.sql import functions as F

from data_quality_check_spark.sources.tables import TableIO


@pytest.fixture()
def tio(spark, tmp_path):
    return TableIO(spark, warehouse=str(tmp_path))


def _sample(spark, n=1000):
    return spark.range(n).select(
        F.concat(F.lit("id"), F.col("id")).alias("image_id"),
        (F.col("id") % 7).alias("val"),
    )


def test_write_read_bucketed_roundtrip(spark, tio):
    df = _sample(spark)
    tio.write_bucketed(df, "db.images", "image_id", num_buckets=8)
    back = tio.read("db.images")
    assert back.count() == 1000
    assert back.select("_bucket").distinct().count() == 8
    # bucket assignment is the documented hash: pmod(xxhash64(col), B)
    bad = back.filter(
        F.col("_bucket") != F.pmod(F.xxhash64("image_id"), F.lit(8)).cast("int")
    ).count()
    assert bad == 0


def test_read_buckets_prunes_partitions(spark, tio):
    tio.write_bucketed(_sample(spark), "db.images", "image_id", num_buckets=8)
    sub = tio.read_buckets("db.images", "image_id", 8, [0, 3])
    assert set(r._bucket for r in sub.select("_bucket").distinct().collect()) == {0, 3}
    # partition pruning must reach the scan: the physical plan's PartitionFilters
    # carries the isin predicate, so only 2 of 8 directories are read
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_bucket" in plan.split("PartitionFilters")[1][:200]


def test_append_and_exists(spark, tio):
    df = _sample(spark, 10)
    assert not tio.exists("db.m")
    tio.overwrite(df, "db.m")
    tio.append(df, "db.m")
    assert tio.exists("db.m")
    assert tio.read("db.m").count() == 20


def test_append_into_bucketed_layout_keeps_partitions(spark, tmp_path):
    """Appending into a bucketed parquet table must land rows in their
    _bucket partitions (or refuse loudly) — unpartitioned appends would sit in
    the table root and vanish from every read_buckets scan."""
    import pandas as pd
    import pytest as _pytest

    from data_quality_check_spark.sources.tables import TableIO

    io = TableIO(spark, str(tmp_path / "wh"))
    io.use_iceberg = False
    base = spark.createDataFrame(pd.DataFrame({"id": range(40), "v": range(40)}))
    io.write_bucketed(base, "t", "id", 4)

    extra = spark.createDataFrame(pd.DataFrame({"id": range(40, 60), "v": range(40, 60)}))
    with _pytest.raises(ValueError, match="bucketed layout"):
        io.append(extra, "t")  # refuses without the bucket spec
    io.append(extra, "t", bucket_col="id", num_buckets=4)

    assert io.read("t").count() == 60
    got = set()
    for b in range(4):
        got |= {r["id"] for r in io.read_buckets("t", "id", 4, [b]).collect()}
    assert got == set(range(60))  # appended rows visible to bucket scans


def test_tableio_backend_parquet_is_path_scoped(spark, tmp_path):
    """backend='parquet' pins the path-based layout regardless of Iceberg
    availability — the contract per-fingerprint scratch warehouses rely on
    (the Iceberg catalog's warehouse is session-fixed, so it cannot honor a
    caller-chosen path). Unknown backends are refused loudly."""
    import os

    import pytest

    from data_quality_check_spark.sources.tables import TableIO

    io = TableIO(spark, warehouse=str(tmp_path / "wh_forced"), backend="parquet")
    assert io.use_iceberg is False  # even if a future session has the jar
    df = spark.range(5).select(F.col("id").alias("k"), F.lit("v").alias("val"))
    io.overwrite(df, "scoped.t")
    assert os.path.isdir(str(tmp_path / "wh_forced" / "scoped" / "t"))
    assert io.read("scoped.t").count() == 5
    with pytest.raises(ValueError, match="backend"):
        TableIO(spark, warehouse=str(tmp_path), backend="delta")
