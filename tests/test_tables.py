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
