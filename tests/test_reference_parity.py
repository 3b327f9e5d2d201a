"""Differential check against the ACTUAL reference implementation.

Everything else in the suite asserts against formulas re-derived from reading
the reference; this file closes the loop by importing `/root/reference/engine.py`
itself (its pure-pandas `PandasScorer` path — no Spark session of its own) and
comparing its `run_scoring` output against ours on the same seeded demo
dataframe. Skipped automatically when the reference checkout isn't present, so
the repo stays standalone.

Tolerances: all dimension formulas round to 0.1, so scores match to ±0.05
except freshness (both engines read the wall clock — reference
engine.py:177/424 uses datetime.now(); sub-second skew can move the lag by a
rounding step) and global_score (weighted blend of the above).
"""

from __future__ import annotations

import os
import sys

import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "engine.py")),
    reason="reference checkout not present (sandbox-only differential check)",
)

DIMS = [
    "completeness",
    "uniqueness",
    "consistency",
    "distribution",
    "validity",
    "correlation",
    "volumetry",
    "standardization",
]


def _ref_engine():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import engine  # noqa: PLC0415

    return engine


@pytest.fixture(scope="module")
def demo_pdf():
    from data_quality_check_spark.pipeline.demo_fixture import demo_ecommerce_pdf

    return demo_ecommerce_pdf()


def test_run_scoring_matches_reference_engine(spark, demo_pdf):
    import data_quality_check_spark as dqx

    eng = _ref_engine()
    ref = eng.run_scoring(demo_pdf, table_name="demo")
    ours = dqx.run_scoring(spark.createDataFrame(demo_pdf), table_name="demo")

    assert ours.row_count == ref.row_count
    assert ours.col_count == ref.col_count
    for d in DIMS:
        assert getattr(ours, d) == pytest.approx(getattr(ref, d), abs=0.051), d
    assert ours.freshness == pytest.approx(ref.freshness, abs=0.5)
    assert ours.global_score == pytest.approx(ref.global_score, abs=0.5)


def test_run_scoring_matches_reference_with_custom_rules(spark, demo_pdf):
    import data_quality_check_spark as dqx

    eng = _ref_engine()
    rules = [
        {"name": "price_positive", "condition": "`price` > 0", "severity": "high"},
        {"name": "qty_bounded", "condition": "`quantity` <= 10", "severity": "low"},
    ]
    ref = eng.run_scoring(demo_pdf, table_name="demo", custom_rules=rules)
    ours = dqx.run_scoring(
        spark.createDataFrame(demo_pdf), table_name="demo", custom_rules=rules
    )
    assert ours.consistency == pytest.approx(ref.consistency, abs=0.051)
    assert ours.global_score == pytest.approx(ref.global_score, abs=0.5)


def test_run_scoring_matches_reference_spark_engine(spark, demo_pdf):
    """Same comparison against the reference's PySparkScorer path (spark handle
    passed) — the engine whose regex dialect we adopted as canonical. Measured
    exact agreement on every dimension (reference issues O(cols+rules) jobs for
    what our plan computes in ≤3)."""
    import data_quality_check_spark as dqx

    eng = _ref_engine()
    sdf = spark.createDataFrame(demo_pdf)
    ref = eng.run_scoring(sdf, table_name="demo", spark=spark)
    ours = dqx.run_scoring(sdf, table_name="demo")
    assert ref.engine == "pyspark"
    for d in DIMS:
        assert getattr(ours, d) == pytest.approx(getattr(ref, d), abs=0.051), d
    assert ours.freshness == pytest.approx(ref.freshness, abs=0.5)
    assert ours.global_score == pytest.approx(ref.global_score, abs=0.5)


def test_column_scores_match_reference(spark, demo_pdf):
    import data_quality_check_spark as dqx

    eng = _ref_engine()
    ref = eng.run_scoring(demo_pdf, table_name="demo")
    ours = dqx.run_scoring(spark.createDataFrame(demo_pdf), table_name="demo")
    ref_cols = {c.name: c for c in ref.columns}
    got_cols = {c.name: c for c in ours.columns}
    assert set(got_cols) == set(ref_cols)
    for name, rc in ref_cols.items():
        gc = got_cols[name]
        assert gc.completeness == pytest.approx(rc.completeness, abs=0.051), name
        # reference per-column uniqueness uses approx_count_distinct on the
        # Spark path but EXACT nunique on this pandas path; ours is exact too
        assert gc.uniqueness == pytest.approx(rc.uniqueness, abs=0.051), name
        assert gc.overall == pytest.approx(rc.overall, abs=0.11), name
