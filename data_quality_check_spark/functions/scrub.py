"""PII / toxicity scrub: rewrite captions in place, leaving every other byte intact.

Two equivalent implementations, tested for exact string equality:
  * `scrub_col` — a chain of JVM-side `regexp_replace` column expressions
    (whole-stage-codegen'd; the default path);
  * `scrub_udf` — one Arrow-batched pandas UDF applying the compiled-`re` pattern
    set per batch (the path the north_star names; preferable when the pattern set
    grows beyond what a regexp_replace chain should inline).

Patterns are written in the Java/PCRE/RE2-common subset (no lookaround, no
backrefs) so the Spark (Java regex), python `re` (golden labels) and DuckDB RE2
(oracles) engines agree. Seeds: the reference's validation regexes engine.py:477-478
and its `clean()` char-folding precedent app_v3.py:507-512.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, functions as F

from data_quality_check_spark.functions.wordlists import TOXIC_WORDS

# order matters: emails before phones (an email's digits must not phone-match)
SCRUB_PATTERNS: list[tuple[str, str]] = [
    (r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    (r"\+[0-9][0-9 ().\-]{6,18}[0-9]", "[PHONE]"),
    (r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "[PHONE]"),
    (r"(?i)\b(" + "|".join(TOXIC_WORDS) + r")\b", "[TOXIC]"),
]

_COMPILED = [(re.compile(p), r) for p, r in SCRUB_PATTERNS]


def scrub_col(col: Column | str) -> Column:
    """JVM-side scrub as a regexp_replace chain (no UDF, codegen-friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, repl in SCRUB_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def scrub_text(s: str | None) -> str | None:
    """Pure-python twin (golden labels, property tests)."""
    if s is None:
        return None
    for rx, repl in _COMPILED:
        s = rx.sub(repl, s)
    return s


def make_scrub_udf():
    """Arrow-batched pandas UDF twin of `scrub_col`."""

    @F.pandas_udf("string")
    def scrub_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            out = s.copy()
            mask = out.notna()
            vals = out[mask]
            for rx, repl in _COMPILED:
                vals = vals.str.replace(rx, repl, regex=True)
            out[mask] = vals
            yield out

    return scrub_udf
