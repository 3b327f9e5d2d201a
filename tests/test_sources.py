"""Source-connector tests: delimiter sniffing, extension dispatch, catalog."""

import os

import pytest

from data_quality_check_spark import sources as S


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    (d / "comma.csv").write_text("a,b,c\n1,2,3\n4,5,6\n")
    (d / "semi.csv").write_text("a;b;c\n1;2;3\n4;5;6\n")
    (d / "tab.csv").write_text("a\tb\tc\n1\t2\t3\n")
    return d


def test_sniff_delimiter(spark, csv_dir):
    assert S.sniff_delimiter(spark, str(csv_dir / "comma.csv")) == ","
    assert S.sniff_delimiter(spark, str(csv_dir / "semi.csv")) == ";"
    assert S.sniff_delimiter(spark, str(csv_dir / "tab.csv")) == "\t"


def test_read_csv_sniffed(spark, csv_dir):
    for name in ["comma.csv", "semi.csv"]:
        df = S.read_csv(spark, str(csv_dir / name))
        assert df.columns == ["a", "b", "c"]
        assert df.count() == 2
        assert df.schema["a"].dataType.typeName() in ("integer", "long")


def test_read_csv_explicit_schema_skips_inference(spark, csv_dir):
    df = S.read_csv(spark, str(csv_dir / "comma.csv"), schema="a string, b string, c string")
    assert [f.dataType.typeName() for f in df.schema.fields] == ["string"] * 3


def test_load_dispatch_parquet(spark):
    df = S.load(spark, "/root/testdata/sf0.001/region.parquet")
    assert df.count() == 5


def test_load_dispatch_table(spark):
    sdf = S.load(spark, "/root/testdata/sf0.001/nation.parquet")
    sdf.createOrReplaceTempView("nation_view")
    assert S.load(spark, "nation_view").count() == sdf.count()
    assert "nation_view" in S.list_tables(spark)


def test_jdbc_reader_builds_plan():
    # no JDBC database in this environment: assert the reader wiring fails with
    # a driver/connect error, not a our-code error
    import data_quality_check_spark as dqx

    spark = dqx.get_spark()
    with pytest.raises(Exception) as ei:
        S.read_jdbc_query(
            spark, "jdbc:postgresql://localhost:1/none", "SELECT 1", driver="org.postgresql.Driver"
        ).count()
    assert "postgresql" in str(ei.value).lower() or "driver" in str(ei.value).lower()
