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


def test_compare_result_catches_dtype_drift():
    """A deliberately un-CAST oracle (DuckDB HUGEINT -> float64) must fail the
    local gate even when values are numerically equal, because the driver's
    typed value-hash distinguishes 99111 from 99111.0 (VERDICT r1 §wrong-1)."""
    import pandas as pd

    from data_quality_check_spark.testing import compare_result

    spark_side = pd.DataFrame({"k": pd.Series([1, 2], dtype="int64")})
    duck_side = pd.DataFrame({"k": pd.Series([1.0, 2.0], dtype="float64")})
    ok, msg = compare_result(spark_side, duck_side)
    assert not ok and "dtype drift" in msg

    same = pd.DataFrame({"k": pd.Series([1, 2], dtype="int64")})
    ok, _ = compare_result(spark_side, same)
    assert ok
