"""Merge-able per-bucket profile partials — metrics maintenance WITHOUT rescans.

The profiler (operators/profiler.py) answers "what are this table's metrics
NOW" with ≤3 fused scans. At 10^12 rows the harder operational question is
"yesterday's corpus grew by one ingest batch — update the metrics": rescanning
the whole table per batch is the anti-pattern. This module keeps the metric
set ALGEBRAIC so it merges:

  * counts / null counts / integer sums / min / max — associative, merged by
    sum (or min/max) over partial rows;
  * distinct counts — Apache DataSketches HLL via Spark's `hll_sketch_agg`:
    partial sketches union losslessly (`hll_union_agg`), so the merged
    estimate is IDENTICAL to the estimate a full-table sketch would produce
    (pytest pins this, plus ±2% of exact on the fixtures).

Operational shape at scale: each ingest batch writes ONE partials row per
bucket next to its data (the same bucket(B, image_id) layout the pipeline
checkpoints by); corpus-wide metrics are a K·B-row merge — no data rescan,
ever. The reference recomputes its whole dashboard per run (engine.py:439-553,
one pandas pass per metric family); this is the distributed counterpart that
makes per-batch re-metrics O(batch) instead of O(corpus).

The merged EXACT metrics equal a direct whole-table aggregate by construction,
which is precisely what the gate query's DuckDB oracle checks (the oracle runs
the direct aggregate; the Spark side runs partial → merge). HLL estimates are
deliberately NOT in the oracle-checked output — DuckDB's approx_count_distinct
is a different sketch — they are pinned by the merge-invariance tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_LG_K = 12  # DataSketches HLL lgConfigK: ~0.8% rel. err, 2^12 buckets


def partial_profile(
    df: DataFrame,
    bucket_col: str,
    cols: list[str],
    sum_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One mergeable metrics row per bucket: rows, per-col null counts + HLL
    sketches, exact sum/min/max for `sum_cols` (integer/decimal columns —
    float sums are NOT merge-stable and are refused by the caller's choice),
    and KLL quantile sketches for `quantile_cols` (cast to long — the integer
    variant; KLL is the mergeable answer to "quantiles without a rescan").

    One hash-partial + final aggregate on the bucket key; at production scale
    this runs once per ingest batch over ONLY that batch's rows."""
    sum_cols = sum_cols or []
    quantile_cols = quantile_cols or []
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in cols:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"nulls__{c}"))
        aggs.append(F.hll_sketch_agg(F.col(c), F.lit(lg_k)).alias(f"sk__{c}"))
    for c in sum_cols:
        aggs.append(F.sum(F.col(c)).alias(f"sum__{c}"))
        aggs.append(F.min(F.col(c)).alias(f"min__{c}"))
        aggs.append(F.max(F.col(c)).alias(f"max__{c}"))
    for c in quantile_cols:
        # try_cast: a NaN or out-of-long-range double degrades to NULL (the
        # KLL agg skips NULLs) instead of an ANSI cast error failing the
        # whole ingest batch's metrics pass
        aggs.append(
            F.kll_sketch_agg_bigint(F.col(c).try_cast("long")).alias(f"kll__{c}")
        )
    return df.groupBy(F.col(bucket_col).alias("bucket")).agg(*aggs)


def _kll_fold(col: F.Column) -> F.Column:
    """Merge an array of KLL sketch blobs with the scalar pairwise merge
    (Spark ships no KLL merge AGGREGATE): seed with the first sketch, fold the
    rest. Partial counts are small (buckets × batches rows of few-KB blobs),
    so the collect_list these arrays come from is executor-bounded."""
    # try_element_at, not element_at: an EMPTY sketch array (no batches yet,
    # or an all-NULL column — kll_sketch_agg returns NULL and collect_list
    # drops it) must fold to a NULL quantile, not an ANSI
    # INVALID_ARRAY_INDEX abort of the whole merge
    return F.aggregate(
        F.slice(col, 2, 2_000_000_000),
        F.try_element_at(col, F.lit(1)),
        lambda acc, x: F.kll_sketch_merge_bigint(acc, x),
    )


def merge_partials(
    parts: DataFrame,
    cols: list[str],
    sum_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Fold partial rows (any number of batches × buckets) into ONE global
    metrics row. Exact metrics merge exactly; distinct estimates come from the
    lossless union of the partial sketches; quantiles from the folded KLL
    (sketch-accurate: merge order affects compaction, so the merged estimate
    can differ from a direct-sketch estimate by sketch error, never more)."""
    sum_cols = sum_cols or []
    quantile_cols = quantile_cols or []
    aggs = [F.sum("rows").alias("row_count")]
    for c in cols:
        aggs.append(F.sum(f"nulls__{c}").alias(f"nulls__{c}"))
        aggs.append(
            F.hll_sketch_estimate(F.hll_union_agg(F.col(f"sk__{c}"))).alias(
                f"distinct_est__{c}"
            )
        )
    for c in sum_cols:
        aggs.append(F.sum(f"sum__{c}").alias(f"sum__{c}"))
        aggs.append(F.min(f"min__{c}").alias(f"min__{c}"))
        aggs.append(F.max(f"max__{c}").alias(f"max__{c}"))
    for c in quantile_cols:
        aggs.append(F.collect_list(f"kll__{c}").alias(f"_klls__{c}"))
    merged = parts.agg(*aggs)
    if not quantile_cols:
        return merged
    out_cols = [
        F.col(a)
        for a in merged.columns
        if not a.startswith("_klls__")
    ]
    for c in quantile_cols:
        folded = _kll_fold(F.col(f"_klls__{c}"))
        for q in quantiles:
            out_cols.append(
                F.kll_sketch_get_quantile_bigint(folded, F.lit(float(q))).alias(
                    f"p{int(round(q * 100)):02d}__{c}"
                )
            )
    return merged.select(*out_cols)
