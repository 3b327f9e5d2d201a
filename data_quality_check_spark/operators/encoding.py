"""Encoding-health (mojibake) audit for text corpora.

Web crawls arrive with broken transport encodings: U+FFFD replacement
characters left by lossy decodes, stray C0/C1 control bytes, double-encoded
UTF-8 ("café" shipped as "cafÃ©" because a UTF-8 byte stream was re-decoded
as Latin-1), and NBSP padding from HTML extraction. CCNet-style pipelines
audit these BEFORE language-ID and perplexity scoring, because every later
text model mis-scores mojibake rather than rejecting it. The reference app
has no encoding pass (its closest cousin is the fake-null standardization
scan, engine.py:289-318 — "known bad literal in a string column"); this
operator is the training-pipeline counterpart over raw text.

Shape at 10^12 rows: every per-document marker count is a JVM `regexp_count`
/ `length-replace` projection inside whole-stage codegen, folded by ONE
map-side-combined aggregate keyed on the (low-cardinality) group column —
no UDF, no second pass, no driver collect. Each expression has a DuckDB SQL
twin built from the same pattern constants, so the audit is value-hashable
cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from data_quality_check_spark.operators.audits import grouped_marker_audit  # noqa: F401  (audit scaffold shared with scrub.pii_density)

# Literal single-char markers (counted via length-diff of replace(), which
# sidesteps regex entirely for the chars an HTML extractor leaves behind).
REPLACEMENT_CHAR = "\ufffd"  # U+FFFD: a decoder already lost the bytes
NBSP_CHAR = "\u00a0"  # U+00A0: HTML &nbsp; that survived extraction

# C0 controls except \t\n\r, plus DEL. ASCII-escape spelling on purpose: the
# identical pattern string is a valid class for BOTH Java regex (Spark) and
# RE2 (DuckDB), and the source file stays free of raw control bytes.
CONTROL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"

# Double-encoded UTF-8 digraphs: each is what one common non-ASCII character
# becomes when its UTF-8 bytes are re-decoded as Latin-1/cp1252 ("é" → "Ã©",
# "'" → "â€™"). A fixed alternation of LITERAL digraphs (no metacharacters),
# so Java regex and RE2 agree byte-for-byte; extend the list to tune recall.
MOJIBAKE_MARKERS = [
    "Ã©", "Ã¨", "Ã¤", "Ã¶", "Ã¼", "Ã±", "Ã§",  # Latin letters
    "â€™", "â€œ", "â€“", "â€”",  # curly quote / left quote / dashes
    "Â£", "Â°", "Â»",  # cp1252 round-trip of £ ° »
]
MOJIBAKE_PATTERN = "|".join(MOJIBAKE_MARKERS)


def _char_count_col(c: Column, ch: str) -> Column:
    """Occurrences of the literal char `ch` in `c` (0 for NULL)."""
    s = F.coalesce(c, F.lit(""))
    return F.length(s) - F.length(F.replace(s, F.lit(ch)))


def _char_count_sql(c: str, codepoint: int) -> str:
    """DuckDB twin of `_char_count_col`; the char is spelled `chr(n)` so the
    generated SQL text stays ASCII even for control/replacement chars."""
    s = f"COALESCE({c}, '')"
    return f"(length({s}) - length(replace({s}, chr({codepoint}), '')))"


def _regex_count_col(c: Column, pattern: str) -> Column:
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(pattern))


def _regex_count_sql(c: str, pattern: str) -> str:
    return f"len(regexp_extract_all(COALESCE({c}, ''), '{pattern}'))"


# (metric name, spark column builder, duckdb fragment builder) — one source of
# truth so the operator and its SQL twin can never drift.
_MARKERS = [
    ("repl", lambda c: _char_count_col(c, REPLACEMENT_CHAR),
     lambda c: _char_count_sql(c, ord(REPLACEMENT_CHAR))),
    ("ctrl", lambda c: _regex_count_col(c, CONTROL_CLASS),
     lambda c: _regex_count_sql(c, CONTROL_CLASS)),
    ("moji", lambda c: _regex_count_col(c, MOJIBAKE_PATTERN),
     lambda c: _regex_count_sql(c, MOJIBAKE_PATTERN)),
    ("nbsp", lambda c: _char_count_col(c, NBSP_CHAR),
     lambda c: _char_count_sql(c, ord(NBSP_CHAR))),
]


def encoding_audit(
    df: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Per-`group_col` encoding-health rows.

    Output per group: `n_docs`, then for each marker family m in
    (repl, ctrl, moji, nbsp): `{m}_chars` (total occurrences) and
    `{m}_docs` (documents with ≥1), plus `docs_affected` (any family),
    `affected_frac` (6-dp). Sorted by group for a deterministic gate.
    Plan shape: see `grouped_marker_audit`.
    """
    c = F.col(text_col)
    return grouped_marker_audit(
        df,
        group_col,
        [(name, mk_col(c)) for name, mk_col, _ in _MARKERS],
        "chars",
        "docs_affected",
        "affected_frac",
    )


def encoding_audit_sql(
    table: str, text_expr: str = "text", group_col: str = "lang"
) -> str:
    """DuckDB oracle twin of `encoding_audit` (same marker constants)."""
    marker_cols = ",\n         ".join(
        f"{mk_sql(text_expr)} AS _{name}" for name, _, mk_sql in _MARKERS
    )
    any_marker = " OR ".join(f"_{name} > 0" for name, _, _ in _MARKERS)
    sums = ",\n       ".join(
        f"CAST(sum(_{name}) AS BIGINT) AS {name}_chars,\n       "
        f"CAST(sum(CASE WHEN _{name} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS {name}_docs"
        for name, _, _ in _MARKERS
    )
    return f"""
WITH base AS (
  SELECT {group_col} AS grp,
         {marker_cols}
  FROM {table}
)
SELECT grp AS {group_col}, count(*) AS n_docs,
       {sums},
       CAST(sum(CASE WHEN {any_marker} THEN 1 ELSE 0 END) AS BIGINT) AS docs_affected,
       round(CAST(sum(CASE WHEN {any_marker} THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS affected_frac
FROM base GROUP BY grp ORDER BY grp
"""
