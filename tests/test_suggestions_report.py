"""Tests for the rule-suggestion engine and the report sink."""

import data_quality_check_spark as dqx
from data_quality_check_spark.operators.report import (
    score_report_json,
    score_report_markdown,
    write_report,
)
from data_quality_check_spark.operators.suggestions import suggest_rules
from data_quality_check_spark.pipeline.demo_fixture import demo_ecommerce


def test_suggest_rules_demo(spark):
    df = demo_ecommerce(spark)
    rules = suggest_rules(df)
    by_col = {}
    for r in rules:
        by_col.setdefault(r["column"], []).append(r)

    # age has injected negatives (i%15==0 → -5) → high-severity non-negative rule
    age = [r for r in by_col["age"] if r["operator"] == ">="][0]
    assert age["severity"] == "high"
    assert age["condition"] == "`age` >= 0"
    # price is non-negative exponential → medium severity
    price = [r for r in by_col["price"] if r["operator"] == ">="][0]
    assert price["severity"] == "medium"
    # status has a 5-value domain (case variants + None) → isin rule
    status = [r for r in by_col["status"] if r["operator"] == "isin"][0]
    assert set(status["value"]) == {"active", "ACTIVE", "Active", "inactive"}
    # email column → contains-@ rule
    assert any(r["operator"] == "contains" for r in by_col["email"])


def test_suggested_conditions_evaluable(spark):
    """Every suggested condition string must run through the profiler's F.expr path."""
    from pyspark.sql import functions as F

    df = demo_ecommerce(spark)
    for r in suggest_rules(df):
        df.filter(~F.expr(r["condition"])).count()  # must not raise


def test_report_rendering(spark, tmp_path):
    df = demo_ecommerce(spark)
    ts = dqx.run_scoring(df, table_name="demo")
    md = score_report_markdown(ts)
    assert "# Data quality report — demo" in md
    assert "Global score" in md and str(ts.global_score) in md
    for dim in ["completeness", "uniqueness", "standardization"]:
        assert dim in md
    assert "Worst columns" in md

    p = write_report(ts, str(tmp_path / "report.md"))
    assert open(p).read() == md
    import json

    j = json.loads(open(str(tmp_path / "report.json")).read())
    assert j["table_name"] == "demo"
    assert j["global_score"] == ts.global_score


def test_domain_guard_excludes_high_cardinality(spark):
    """A near-unique string column must be rejected by the HLL pass so its
    distinct values never enter a collect_set aggregation buffer (the one
    scale-killer flagged in round 1): only the tiny-domain column is a
    candidate, and suggestions still find its exact domain."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators.suggestions import (
        DOMAIN_ACD_GUARD,
        domain_candidates,
        suggest_rules,
    )

    n = 200_000
    df = spark.range(n).select(
        F.concat(F.lit("user-"), F.col("id")).alias("user_key"),  # ~200k distinct
        F.element_at(
            F.array(F.lit("bronze"), F.lit("silver"), F.lit("gold")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("tier"),  # 3-value domain
    )
    cand, estimates = domain_candidates(df, ["user_key", "tier"])
    assert cand == ["tier"]
    assert estimates["user_key"] > DOMAIN_ACD_GUARD

    rules = suggest_rules(df)
    isin = [r for r in rules if r["operator"] == "isin"]
    assert len(isin) == 1 and isin[0]["column"] == "tier"
    assert set(isin[0]["value"]) == {"bronze", "silver", "gold"}


def test_pdf_report_valid_and_complete(spark, tmp_path):
    """The from-scratch PDF writer (reference S14 artifact surface) must emit a
    structurally valid PDF whose text content carries the whole report: header,
    parseable xref offsets, and every markdown line's text present in the
    uncompressed content streams."""
    import re

    from data_quality_check_spark.operators.pdf import render_pdf_lines
    from data_quality_check_spark.operators.report import score_report_markdown

    df = demo_ecommerce(spark)
    ts = dqx.run_scoring(df, table_name="demo")
    p = write_report(ts, str(tmp_path / "report.md"))
    pdf = open(str(tmp_path / "report.pdf"), "rb").read()

    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    # xref offsets must point at the objects they claim
    xref_at = int(pdf.rsplit(b"startxref", 1)[1].split()[0])
    assert pdf[xref_at : xref_at + 4] == b"xref"
    for i, m in enumerate(re.finditer(rb"(\d{10}) 00000 n", pdf)):
        off = int(m.group(1))
        assert pdf[off:].startswith(b"%d 0 obj" % (i + 1))

    # text completeness: every rendered Tj string appears, and every markdown
    # content line made it in
    texts = [m.group(1) for m in re.finditer(rb"\((.*)\) Tj", pdf)]
    joined = b"\n".join(texts).decode("latin-1")
    assert "Data quality report" in joined and "Global score" in joined
    for dim in ["completeness", "uniqueness", "standardization"]:
        assert dim in joined

    # pagination: a long report spills to >1 page
    long_pdf = render_pdf_lines([f"line {i}" for i in range(200)])
    assert long_pdf.count(b"/Type /Page ") >= 2
