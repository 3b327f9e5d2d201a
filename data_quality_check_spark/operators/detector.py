"""Column-role auto-detection (driver-side, bounded sample).

Re-implements the reference's `ColumnAutoDetector` semantics (engine.py:62-109):
name-keyword classification for email/phone/date columns, a seeded 30-value
parse-rate probe for ambiguous string columns, and zip-paired correlation rules
(HT/TTC amount pairs, start/end date pairs). Works directly on a Spark DataFrame:
schema types come from `df.schema`, the value probe from a `limit(500)` Arrow
sample — never more than 500 rows leave the cluster (engine.py:584-590 precedent).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, types as T

EMAIL_KW = ["email", "mail", "courriel"]
PHONE_KW = ["phone", "tel", "mobile", "gsm", "portable"]
DATE_KW = [
    "date", "created_at", "updated_at", "timestamp", "subscription",
    "since", "birth", "expir", "modified_at", "datetime",
]
START_KW = ["created", "start", "begin", "debut", "open", "first", "from"]
END_KW = ["end", "fin", "expir", "close", "stop", "last", "to", "until"]
EMAIL_RE = re.compile(r"^[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}$")

SAMPLE_ROWS = 500
PROBE_VALUES = 30
PROBE_SEED = 42
PARSE_RATE_THRESHOLD = 0.7

_NUMERIC_TYPES = (T.DoubleType, T.FloatType, T.IntegerType, T.LongType)
_TEMPORAL_TYPES = (T.TimestampType, T.DateType, T.TimestampNTZType)


def detect_config(df: DataFrame, sample: pd.DataFrame | None = None) -> dict:
    """Classify columns into email/phone/date roles and derive correlation rules."""
    res: dict = {"email_columns": [], "phone_columns": [], "date_columns": [], "correlation_rules": []}
    fields = {f.name: f.dataType for f in df.schema.fields}

    pdf = sample
    string_cols = [c for c, t in fields.items() if isinstance(t, T.StringType)]

    for col, dtype in fields.items():
        cl = col.lower().strip()
        if any(kw in cl for kw in EMAIL_KW):
            res["email_columns"].append(col)
            continue
        if any(kw in cl for kw in PHONE_KW):
            res["phone_columns"].append(col)
            continue
        if any(kw in cl for kw in DATE_KW) or isinstance(dtype, _TEMPORAL_TYPES):
            res["date_columns"].append(col)
            continue
        if isinstance(dtype, T.StringType):
            if pdf is None:
                pdf = df.select(*string_cols).limit(SAMPLE_ROWS).toPandas()
            vals = pdf[col].dropna().astype(str)
            if len(vals) == 0:
                continue
            probe = vals.sample(min(PROBE_VALUES, len(vals)), random_state=PROBE_SEED)
            parsed = pd.to_datetime(probe, errors="coerce", format="mixed")
            if parsed.notna().mean() > PARSE_RATE_THRESHOLD:
                res["date_columns"].append(col)
                continue
            if probe.str.match(EMAIL_RE).mean() > PARSE_RATE_THRESHOLD:
                res["email_columns"].append(col)

    # paired net/gross amount invariants (ht < ttc)
    num = [c for c, t in fields.items() if isinstance(t, _NUMERIC_TYPES)]
    ht = [c for c in num if "ht" in c.lower() and "ttc" not in c.lower()]
    ttc = [c for c in num if "ttc" in c.lower()]
    for h, t in zip(ht, ttc):
        res["correlation_rules"].append(
            {"col_a": h, "col_b": t, "operator": "<", "name": f"{h} < {t}", "severity": "high"}
        )

    # paired start/end date invariants
    dates = res["date_columns"]
    starts = [c for c in dates if any(kw in c.lower() for kw in START_KW)]
    ends = [c for c in dates if any(kw in c.lower() for kw in END_KW)]
    for s, e in zip(starts, ends):
        if s != e:
            res["correlation_rules"].append(
                {"col_a": s, "col_b": e, "operator": "<", "name": f"{s} before {e}", "severity": "high"}
            )
    return res
