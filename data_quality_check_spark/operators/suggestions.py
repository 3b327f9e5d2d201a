"""Rule-suggestion engine — Spark-first port of the reference's suggester.

The reference derives suggested rules from a cached 200-row pandas sample
(app_v3.py:1497-1614): non-negativity for amount-keyword numeric columns
(A15: sample min/max/mean-of-bool), `isin` membership for small string domains
(A16/O3: 2-6 uniques, first 6 sorted), an email-contains check (P9), and range
fences from sample min/max. Emitted rules use the same condition-string DSL the
profiler consumes via `F.expr` (engine.py:445 semantics).

Spark-first changes: the sample is an Arrow-backed `limit(n).toPandas()` (never
more than `sample_rows` rows leave the cluster), and small-domain detection is
two-pass over the FULL table — the sample decides nothing that the whole data
contradicts (the reference's 200-row `unique()` can miss domain values):

  pass 1: ONE fused `approx_count_distinct` per string column (HLL sketches,
          constant memory per column regardless of cardinality);
  pass 2: `sort_array(collect_set)` ONLY for columns whose sketch says the
          domain is tiny (≤ 2×DOMAIN_MAX slack for HLL error), so a
          high-cardinality column never accumulates its distinct values in an
          aggregation buffer — at web scale a free-text column would OOM the
          single reduced partition otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

AMOUNT_KW = ["price", "amount", "montant", "qty", "quantity", "age", "total", "salary"]
DOMAIN_MIN, DOMAIN_MAX = 2, 6
# approx_count_distinct's default rsd is 0.05; 2× slack means a true ≤6-value
# domain is never missed, while anything the sketch reports above this is
# certainly too large to collect exactly (a >12-estimate cannot be a ≤6 truth).
DOMAIN_ACD_GUARD = DOMAIN_MAX * 2
SAMPLE_ROWS = 200


def _q(col: str) -> str:
    return f"`{col}`"


def domain_candidates(df: DataFrame, strings: list[str]) -> tuple[list[str], dict]:
    """Pass 1 of small-domain detection: fused HLL distinct estimates.

    Returns (columns safe to collect exactly, {col: estimate}). Only columns
    whose estimate is ≤ DOMAIN_ACD_GUARD ever reach a `collect_set`, so the
    exact pass's aggregation buffer is bounded by ~DOMAIN_ACD_GUARD values per
    column no matter how wide the real domain is.
    """
    if not strings:
        return [], {}
    row = df.agg(
        *[F.approx_count_distinct(c).alias(f"acd__{c}") for c in strings]
    ).collect()[0].asDict()
    estimates = {c: row[f"acd__{c}"] for c in strings}
    cand = [c for c in strings if DOMAIN_MIN <= estimates[c] <= DOMAIN_ACD_GUARD]
    return cand, estimates


def suggest_rules(df: DataFrame, sample_rows: int = SAMPLE_ROWS) -> list[dict]:
    """Suggested rules in the reference's dict shape:
    {name, condition, column, severity, operator, value}."""
    numeric = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType, T.IntegerType, T.LongType))
    ]
    strings = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]

    suggestions: list[dict] = []
    pdf = df.select(*(numeric + strings)).limit(sample_rows).toPandas() if (numeric or strings) else None

    # two-pass small-domain membership (A14/A16 pattern): HLL guard first,
    # exact collect_set only for columns the guard admits — bounded buffers.
    domain_values: dict[str, list] = {}
    cand, _ = domain_candidates(df, strings)
    if cand:
        row = df.agg(
            *[
                F.slice(
                    F.sort_array(F.collect_set(F.col(c))), 1, DOMAIN_MAX + 1
                ).alias(f"dom__{c}")
                for c in cand
            ]
        ).collect()[0].asDict()
        for c in cand:
            if len(row[f"dom__{c}"]) <= DOMAIN_MAX:
                domain_values[c] = row[f"dom__{c}"]

    for c in numeric:
        cl = c.lower()
        if not any(k in cl for k in AMOUNT_KW):
            continue
        s = pdf[c].dropna()
        if s.empty:
            continue
        if (s < 0).mean() > 0:
            sev = "high"
        else:
            sev = "medium"
        suggestions.append(
            {
                "name": f"{c} non-negative",
                "condition": f"{_q(c)} >= 0",
                "column": c,
                "severity": sev,
                "operator": ">=",
                "value": 0,
            }
        )

    for c, values in domain_values.items():
        # escape backslashes BEFORE quotes: a value like r"path\" would
        # otherwise escape its own closing quote (parse error in F.expr) and a
        # mid-string backslash would reinterpret as an escape sequence
        quoted = ", ".join(
            "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"
            for v in values
        )
        suggestions.append(
            {
                "name": f"{c} in known domain",
                "condition": f"{_q(c)} IN ({quoted})",
                "column": c,
                "severity": "medium",
                "operator": "isin",
                "value": list(values),
            }
        )

    for c in strings:
        if pdf is None or c not in pdf:
            continue
        s = pdf[c].dropna().astype(str)
        if len(s) and s.str.contains("@", regex=False).mean() > 0.7:
            suggestions.append(
                {
                    "name": f"{c} looks like email",
                    "condition": f"{_q(c)} LIKE '%@%'",
                    "column": c,
                    "severity": "medium",
                    "operator": "contains",
                    "value": "@",
                }
            )
    return suggestions
