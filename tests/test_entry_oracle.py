"""Replicates the driver's correctness gate: every queries() entry must match its
DuckDB oracle exactly (row count + columns + values) at the test scale factor."""

import os

import pytest

from data_quality_check_spark.testing import run_gate

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    results = run_gate(spark, SF_DIR, names=[name])
    ok, msg = results[name]
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
