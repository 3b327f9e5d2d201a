"""Physical-plan assertions: the properties the 100 TB design depends on must
be visible in the executed plan, not just claimed in docstrings.

  * column pruning — the dedup-decision scan never reads `bytes`/`caption`
    (SURVEY.md §4.2: `bytes` is ~10^5× wider than the id columns);
  * filter pushdown — a caption-stage predicate reaches the parquet scan as
    PushedFilters;
  * JVM-only profiling — the fused score plans contain no Python evaluation
    node (BatchEvalPython/ArrowEvalPython): every heuristic stays inside
    whole-stage codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dup_decisions_never_reads_bytes(spark, tmp_path):
    from data_quality_check_spark.pipeline.fixtures import write_images_parquet
    from data_quality_check_spark.pipeline.run import dup_decisions, with_rid

    fix = str(tmp_path / "images")
    write_images_parquet(fix, n=200, num_files=2)
    df = with_rid(spark.read.parquet(fix))
    plan = _plan(dup_decisions(df))
    # every scan's ReadSchema must exclude the wide columns
    for chunk in plan.split("ReadSchema")[1:]:
        schema_line = chunk[:400]
        assert "bytes" not in schema_line and "caption" not in schema_line


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    q = df.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    pushed = plan.split("PushedFilters")[1][:200]
    assert "l_quantity" in pushed
    read = plan.split("ReadSchema")[1][:300]
    assert "l_extendedprice" not in read  # projection pruned to 2 columns


def test_profile_plan_is_jvm_only(spark):
    from data_quality_check_spark import entry_queries as EQ

    for name in ["profile_scores_customer", "grouped_scores_events_by_type"]:
        df = EQ.queries()[name](spark, SF_DIR)
        plan = _plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
