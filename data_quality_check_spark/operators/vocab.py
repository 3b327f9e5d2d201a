"""Corpus vocabulary statistics: top-k token heavy hitters with term and
document frequency — the tf/df building block for vocab audits, boilerplate
detection, and stopword discovery over a crawl.

The reference profiles per-column value samples (engine.py:83-87 caps at 30
rows) but has no corpus-level term statistics; a training-data pipeline needs
them over the full corpus, distributed.

Scale notes (100 TB):
  * tokenization is ONE JVM-side `regexp_extract_all` + `explode` projection —
    no Python, no pre-shuffle materialization of the token table;
  * the aggregate is `groupBy(token)` with count + exact distinct-doc count:
    Spark plans the distinct as a two-phase partial aggregate, so only the
    deduplicated (token, doc_id) pairs shuffle — combiner-friendly on both
    phases. Zipf guarantees the head tokens are hot keys, but partial
    aggregation absorbs the skew map-side (each task emits one row per
    (token, doc_id) it saw);
  * top-k is `orderBy(...).limit(k)` — Spark compiles this to
    TakeOrderedAndProject (per-partition bounded heap, driver merges k rows
    per partition), never a global sort. A plan test pins the node.

Token alphabet is `[a-z0-9]+` over lowercased text — inside the Java-regex ∩
RE2 subset (functions/text.py:32-46), so the DuckDB oracle twin tokenizes
byte-identically; non-ASCII letters act as separators in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "[a-z0-9]+"


def top_tokens(
    df: DataFrame, id_col: str, text_col: str, k: int = 25, min_len: int = 1
) -> DataFrame:
    """Top-k corpus tokens by occurrence count (ties broken by token asc,
    so the k-boundary is deterministic across engines and partitionings).

    Output: (token, n_occurrences, n_docs) — term frequency and document
    frequency per surviving token.
    """
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("token"),
    )
    if min_len > 1:
        toks = toks.filter(F.length("token") >= min_len)
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("_doc").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def top_tokens_sql(
    table: str, id_col: str, text_col: str, k: int = 25, min_len: int = 1
) -> str:
    """DuckDB twin of `top_tokens` (same tokenizer subset, same tie-break)."""
    where = f"WHERE length(token) >= {min_len}" if min_len > 1 else ""
    return f"""
SELECT token, count(*) AS n_occurrences, count(DISTINCT _doc) AS n_docs
FROM (SELECT {id_col} AS _doc,
             unnest(regexp_extract_all(lower({text_col}), '{TOKEN_RE}')) AS token
      FROM {table}) {where}
GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {k}
"""
