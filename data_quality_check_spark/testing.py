"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

The grading driver runs each `__spark_entry__.queries()[name]` at sf=0.01 and
compares row-count + schema + order-insensitive value hash against
`oracle_sql()[name]` run by DuckDB. This module reproduces that comparison so
mismatches are caught in pytest before the driver sees them.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    sort_keys = pdf.astype(str)
    order = sort_keys.sort_values(by=list(pdf.columns), kind="mergesort").index
    return pdf.loc[order].reset_index(drop=True)


def compare_result(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, float_ulps_exact: bool = True):
    """Return (ok, message). Exact match required (floats bit-compare with NaN==NaN)."""
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return False, f"column mismatch: spark={s_cols} duck={d_cols}"
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    for c in s.columns:
        a, b = s[c], d[c]
        # The driver's value hash is dtype-sensitive: DuckDB sum(INTEGER)
        # returns HUGEINT which pandas materializes as float64 (99111.0),
        # while Spark's bigint stays int64 (99111) — equal values, different
        # hash. Fail on integer-vs-float kind drift so pytest catches what
        # the driver catches (CAST the oracle to BIGINT to fix).
        a_float = pd.api.types.is_float_dtype(a)
        b_float = pd.api.types.is_float_dtype(b)
        a_int = pd.api.types.is_integer_dtype(a)
        b_int = pd.api.types.is_integer_dtype(b)
        if (a_float and b_int) or (a_int and b_float):
            return False, (
                f"dtype drift in '{c}': spark={a.dtype} duck={b.dtype} — the "
                f"driver's typed value-hash would mismatch even if values are "
                f"equal; CAST the oracle side explicitly"
            )
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            av = a.astype(float).to_numpy()
            bv = b.astype(float).to_numpy()
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not same.all():
                i = int(np.argmin(same))
                return False, (
                    f"float mismatch in '{c}' at canon-row {i}: {av[i]!r} vs {bv[i]!r} "
                    f"(max abs diff {np.nanmax(np.abs(av - bv))})"
                )
        else:
            av, bv = a.astype(object), b.astype(object)
            neq = [
                i
                for i, (x, y) in enumerate(zip(av, bv))
                if not _cells_equal(x, y)
            ]
            if neq:
                i = neq[0]
                return False, f"value mismatch in '{c}' at canon-row {i}: {av[i]!r} vs {bv[i]!r}"
    return True, "ok"


def _cells_equal(x, y) -> bool:
    """Scalar OR container cell equality: array<...> columns come back as
    np.ndarray (Spark) / list (DuckDB) cells, where a bare `x == y` is an
    elementwise array whose truthiness raises — the gate must report a
    mismatch, never crash."""
    if isinstance(x, (np.ndarray, list, tuple)) or isinstance(y, (np.ndarray, list, tuple)):
        if x is None or y is None:
            return x is None and y is None
        return np.array_equal(np.asarray(x, dtype=object), np.asarray(y, dtype=object))
    return bool(x == y) or (_is_nan(x) and _is_nan(y))


def _is_nan(x) -> bool:
    try:
        return x is None or (isinstance(x, float) and math.isnan(x)) or pd.isna(x)
    except (TypeError, ValueError):
        return False


def run_gate(spark, sf_dir: str | None = None, names: list[str] | None = None) -> dict:
    """Run every queries()/oracle_sql() pair and return {name: (ok, message)}."""
    import __spark_entry__ as entry

    sf_dir = sf_dir or DEFAULT_SF_DIR
    con = duck_connection(sf_dir)
    queries = entry.queries()
    # lazy oracle builders (oracles.py twins) resolve against ORACLE_SF_DIR —
    # keep it in lockstep with the gate's sf_dir so twin artifacts match the
    # tables the Spark side reads
    import data_quality_check_spark.entry_queries as EQ

    prev = EQ.ORACLE_SF_DIR
    EQ.ORACLE_SF_DIR = sf_dir
    try:
        oracles = entry.oracle_sql()
    finally:
        EQ.ORACLE_SF_DIR = prev
    results = {}
    from data_quality_check_spark.operators.dedup import release_pins

    for name, fn in queries.items():
        if names and name not in names:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        release_pins()  # free per-query signature/label caches
        if name not in oracles:
            results[name] = (True, f"rows-only: {len(sdf)} rows")
            continue
        ddf = con.execute(oracles[name]).df()
        results[name] = compare_result(sdf, ddf)
    return results
