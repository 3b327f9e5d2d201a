"""Unit tests for the encoding-health (mojibake) audit operator."""

import duckdb
import pytest
from pyspark.sql import Row

from data_quality_check_spark.operators import encoding as EN


@pytest.fixture(scope="module")
def audit_rows(spark):
    rows = [
        # clean doc
        Row(doc_id=1, text="plain ascii text", lang="en"),
        # two replacement chars + one NBSP
        Row(doc_id=2, text="lost \ufffd bytes \ufffd here\u00a0now", lang="en"),
        # mojibake digraph + control byte
        Row(doc_id=3, text="cafÃ© menu \x07 bell", lang="fr"),
        # NULL text must count as a clean doc, not crash
        Row(doc_id=4, text=None, lang="fr"),
        # tab/newline/CR are NOT control-flagged (legitimate whitespace)
        Row(doc_id=5, text="a\tb\nc\rd", lang="en"),
    ]
    df = spark.createDataFrame(rows)
    out = {r["lang"]: r.asDict() for r in EN.encoding_audit(df).collect()}
    return out


def test_marker_counts_per_family(audit_rows):
    en = audit_rows["en"]
    assert en["n_docs"] == 3
    assert en["repl_chars"] == 2 and en["repl_docs"] == 1
    assert en["nbsp_chars"] == 1 and en["nbsp_docs"] == 1
    assert en["ctrl_chars"] == 0, "tab/newline/CR must not be flagged"
    assert en["moji_docs"] == 0
    assert en["docs_affected"] == 1
    assert en["affected_frac"] == pytest.approx(1 / 3, abs=1e-6)


def test_mojibake_and_control_and_null(audit_rows):
    fr = audit_rows["fr"]
    assert fr["n_docs"] == 2
    assert fr["moji_docs"] == 1 and fr["moji_chars"] == 1
    assert fr["ctrl_chars"] == 1 and fr["ctrl_docs"] == 1
    assert fr["docs_affected"] == 1  # the NULL doc is clean


def test_sql_twin_matches_spark(spark):
    """The DuckDB twin over the same literal rows must agree value-for-value."""
    rows = [
        (1, "ok text", "en"),
        (2, "bad \ufffd and nbsp and cafÃ©", "en"),
        (3, None, "de"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r["lang"]: r.asDict() for r in EN.encoding_audit(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
    want = con.sql(EN.encoding_audit_sql("docs")).df().to_dict("records")
    for w in want:
        g = got[w["lang"]]
        for k, v in w.items():
            assert g[k] == pytest.approx(v), (w["lang"], k, g[k], v)


def test_pii_density_matches_python_golden(spark):
    """Java regexp_count per class must agree with the compiled-re golden on
    shapes covering every pattern family, overlaps, and NULL."""
    from data_quality_check_spark.functions import scrub as S

    texts = [
        "mail a@b.com and b@c.org",              # 2 emails
        "call +1 (555) 867-5309 or 555 867 5309",  # both phone forms
        "you STUPID Idiot",                       # case-insensitive toxic x2
        "digits inside user555-867-5309@x.com stay an email",
        "clean text with no pii at all",
        None,
    ]
    rows = [(i, t, "en") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = S.pii_density(df, "text", "lang").collect()[0].asDict()

    golden = [S.pii_counts_text(t) for t in texts]
    for cls in ("email", "phone", "toxic"):
        assert got[f"{cls}_hits"] == sum(g[cls] for g in golden), cls
        assert got[f"{cls}_docs"] == sum(g[cls] > 0 for g in golden), cls
    assert got["n_docs"] == 6
    assert got["pii_docs"] == sum(any(g.values()) for g in golden)
    # the embedded-email row must not double-count as a phone
    assert golden[3] == {"email": 1, "phone": 0, "toxic": 0}
