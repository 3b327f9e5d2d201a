"""Embedding-corpus health audit: broken-shard detection before ANN/dedup.

Every embedding-consuming stage in this package (`similarity.py`'s LSH / IVF /
SemDeDup, `alignment.py`'s cross-modal gate) assumes vectors are well-formed.
In a real pipeline embeddings arrive from a fleet of encoder shards, and a
single bad shard emits NaN rows, zero vectors, or wrong-width arrays that
silently poison every cosine downstream (NaN similarity comparisons are false,
so corrupt vectors sail through near-dup filters). This module is the audit a
pipeline runs between "encoder wrote parquet" and "ANN index build":

* `embedding_health` — ONE corpus row: null / wrong-width / non-finite /
  zero-norm counts plus norm moments over the healthy subset. Row-local
  expressions (`F.aggregate` for the norm — no explode) feeding a single
  partial/final aggregate: the only exchange is the final single-row gather,
  nothing keyed ever shuffles, arrays never leave their scan partition.
* `dimension_stats` — per-dimension mean / std / min / max with a collapsed
  flag (std < eps): the variance-collapse audit that catches an encoder stuck
  emitting a constant coordinate (typical symptom of a truncated checkpoint).
  `posexplode` widens rows N→N×D inside whole-stage codegen (pipelined, never
  materialized); the partial hash-aggregate reduces each task to ≤D rows
  before the exchange, so the shuffle is D×tasks rows regardless of corpus
  size — the same partial/final shape as the profiler's fused aggregates.

This is the per-dimension analogue of the reference's per-column numeric
profiling (min/max/mean over table columns — engine.py:439-470) applied to
the array axis the reference's pandas profiler cannot see.

The DuckDB twins (`*_sql`) mirror the semantics exactly: parallel `unnest`s
zip positionally (dim index = `range(d)`, matching `posexplode`'s 0-based
pos), and both engines agree on the healthy-vector predicate before any
moment is computed, so a NaN never reaches an avg in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# below this L2 norm a vector is "zero" (cosine undefined → poison downstream)
ZERO_NORM_EPS = 1e-6
# below this population std a dimension is "collapsed" (constant coordinate)
COLLAPSE_EPS = 1e-6
_ROUND = 4  # house float policy: both engines round(…, 4) after double math


def _nonfinite(e: Column) -> Column:
    # any NaN or ±Inf element; float32 Inf compares equal to the double literal
    return F.exists(e, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))))


def _norm(e: Column) -> Column:
    # row-local L2 norm: fold in double so float32 squares can't overflow
    return F.sqrt(
        F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def _shape_preds(e: Column, dim: int) -> tuple[Column, Column, Column, Column]:
    is_null = e.isNull()
    wrong_dim = ~is_null & (F.size(e) != dim)
    shaped = ~is_null & (F.size(e) == dim)
    nonfinite = shaped & _nonfinite(e)
    healthy = shaped & ~_nonfinite(e)
    return is_null, wrong_dim, nonfinite, healthy


def embedding_health(df: DataFrame, col: str, dim: int) -> DataFrame:
    """One-row corpus health summary for an `array<float>` column.

    Counts are disjoint by construction: every vector is exactly one of
    null / wrong_dim / nonfinite / zero_norm / healthy-nonzero, so
    `n_vectors = n_null + n_wrong_dim + n_nonfinite + n_zero_norm + n_ok`.
    Norm moments cover healthy vectors (zero-norm included — it is a valid
    norm; NaN/Inf are not). 100 TB shape: one row-local projection + one
    global aggregate with map-side partials; no key shuffle, no Python.
    """
    e = F.col(col)
    is_null, wrong_dim, nonfinite, healthy = _shape_preds(e, dim)
    norm = F.when(healthy, _norm(e))
    zero_norm = healthy & (norm < ZERO_NORM_EPS)

    def cnt(pred: Column) -> Column:
        return F.sum(pred.cast("long"))

    return df.select(
        is_null.alias("_null"),
        wrong_dim.alias("_wrong"),
        nonfinite.alias("_nonfin"),
        zero_norm.alias("_zero"),
        (healthy & ~zero_norm).alias("_ok"),
        norm.alias("_norm"),
    ).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        cnt(F.col("_null")).alias("n_null"),
        cnt(F.col("_wrong")).alias("n_wrong_dim"),
        cnt(F.col("_nonfin")).alias("n_nonfinite"),
        cnt(F.col("_zero")).alias("n_zero_norm"),
        cnt(F.col("_ok")).alias("n_ok"),
        F.round(F.avg("_norm"), _ROUND).alias("norm_mean"),
        F.round(F.stddev_pop("_norm"), _ROUND).alias("norm_std"),
        F.round(F.min("_norm"), _ROUND).alias("norm_min"),
        F.round(F.max("_norm"), _ROUND).alias("norm_max"),
    )


def embedding_health_sql(table: str, col: str, dim: int) -> str:
    """DuckDB twin of `embedding_health` (same names, same rounding)."""
    return f"""
WITH v AS (
  SELECT {col} AS e,
    ({col} IS NULL) AS _null,
    ({col} IS NOT NULL AND len({col}) != {dim}) AS _wrong,
    ({col} IS NOT NULL AND len({col}) = {dim}
      AND len(list_filter({col}, x -> isnan(x) OR isinf(x))) > 0) AS _nonfin,
    ({col} IS NOT NULL AND len({col}) = {dim}
      AND len(list_filter({col}, x -> isnan(x) OR isinf(x))) = 0) AS _healthy
  FROM {table}
), w AS (
  SELECT *, CASE WHEN _healthy THEN
      sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * x))) END AS _norm
  FROM v
)
SELECT count(*) AS n_vectors,
  CAST(sum(CASE WHEN _null THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(sum(CASE WHEN _wrong THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
  CAST(sum(CASE WHEN _nonfin THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
  CAST(sum(CASE WHEN _healthy AND _norm < {ZERO_NORM_EPS} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_zero_norm,
  CAST(sum(CASE WHEN _healthy AND _norm >= {ZERO_NORM_EPS} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_ok,
  round(avg(_norm), {_ROUND}) AS norm_mean,
  round(stddev_pop(_norm), {_ROUND}) AS norm_std,
  round(min(_norm), {_ROUND}) AS norm_min,
  round(max(_norm), {_ROUND}) AS norm_max
FROM w
"""


def dimension_stats(df: DataFrame, col: str, dim: int) -> DataFrame:
    """Per-dimension moments over healthy vectors + variance-collapse flag.

    Output: (dim, mean, std, vmin, vmax, collapsed) — `dim` is the 0-based
    coordinate index, D rows total. Healthy-vector filter runs BEFORE the
    explode so a single NaN row can't poison a dimension's moments. 100 TB
    shape: codegen'd Generate (pipelined N×D expansion, never materialized)
    → partial hash agg to ≤D rows per task → one D-key exchange.
    """
    e = F.col(col)
    *_, healthy = _shape_preds(e, dim)
    exploded = (
        df.filter(healthy)
        .select(F.posexplode(e).alias("dim", "_v"))
        # long dim: DuckDB's range() is BIGINT and the driver's value-hash is
        # dtype-sensitive — keep both engines on the same integer width
        .select(F.col("dim").cast("long").alias("dim"), F.col("_v").cast("double").alias("_v"))
    )
    std = F.stddev_pop("_v")
    return exploded.groupBy("dim").agg(
        F.round(F.avg("_v"), _ROUND).alias("mean"),
        F.round(std, _ROUND).alias("std"),
        F.round(F.min("_v"), _ROUND).alias("vmin"),
        F.round(F.max("_v"), _ROUND).alias("vmax"),
        (std < COLLAPSE_EPS).alias("collapsed"),
    )


def dimension_stats_sql(table: str, col: str, dim: int) -> str:
    """DuckDB twin of `dimension_stats`: parallel unnests zip positionally,
    `range({dim})` yields the same 0-based index as `posexplode`."""
    return f"""
WITH healthy AS (
  SELECT {col} AS e FROM {table}
  WHERE {col} IS NOT NULL AND len({col}) = {dim}
    AND len(list_filter({col}, x -> isnan(x) OR isinf(x))) = 0
), ex AS (
  SELECT unnest(range({dim})) AS dim, CAST(unnest(e) AS DOUBLE) AS v FROM healthy
)
SELECT dim, round(avg(v), {_ROUND}) AS mean, round(stddev_pop(v), {_ROUND}) AS std,
  round(min(v), {_ROUND}) AS vmin, round(max(v), {_ROUND}) AS vmax,
  (stddev_pop(v) < {COLLAPSE_EPS}) AS collapsed
FROM ex GROUP BY dim
"""
