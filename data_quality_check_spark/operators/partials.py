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
    tree_fanout: int = 64,
) -> DataFrame:
    """Fold partial rows (any number of batches × buckets) into ONE global
    metrics row. Exact metrics merge exactly; distinct estimates come from the
    lossless union of the partial sketches; quantiles from the folded KLL
    (sketch-accurate: merge order affects compaction, so the merged estimate
    can differ from a direct-sketch estimate by sketch error, never more).

    The KLL fold is a TWO-LEVEL tree (Spark ships no KLL merge aggregate, so
    the expression fold is the primitive): level 1 groups partial rows into
    `tree_fanout` hash groups, each folding its own sketches in parallel
    tasks; level 2 folds the ≤tree_fanout group sketches. A P-row partials
    table thus costs max(P/fanout, fanout) sequential merges on the critical
    path instead of P — at 10⁵ partial rows that is ~1.6k, executor-trivial.
    Exact metrics and HLL unions are order-free, so the tree cannot change
    them; KLL compaction order shifts estimates only within sketch error
    (pinned by the fold-order property test)."""
    sum_cols = sum_cols or []
    quantile_cols = quantile_cols or []
    if quantile_cols:
        # level 1: parallel per-group partial merges (same row schema)
        parts = compact_partials(
            parts,
            cols,
            sum_cols,
            quantile_cols,
            group_by=F.pmod(F.crc32(F.col("bucket").cast("string")), F.lit(tree_fanout)),
        )
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


def compact_partials(
    parts: DataFrame,
    cols: list[str],
    sum_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    group_by: F.Column | None = None,
) -> DataFrame:
    """Re-emit merged partial rows with the SAME schema `partial_profile`
    writes — the periodic compaction step for a long-lived partials table.

    A daily-ingest corpus accretes batches × buckets rows; compaction folds
    them back to one row per bucket (default `group_by`), so both the table
    and every later `merge_partials` stay O(buckets) no matter how many
    batches have landed. All columns re-merge losslessly into their own type:
    counts/sums by sum, min/max by min/max, HLL by `hll_union_agg` (still a
    sketch blob, NOT an estimate), KLL by the pairwise blob fold — so
    compact(compact(X)) ≡ compact(X) and merge(compact(X)) ≡ merge(X) for
    exact metrics, within sketch error for estimates."""
    sum_cols = sum_cols or []
    quantile_cols = quantile_cols or []
    key = F.col("bucket") if group_by is None else group_by
    aggs = [F.sum("rows").alias("rows")]
    for c in cols:
        aggs.append(F.sum(f"nulls__{c}").alias(f"nulls__{c}"))
        aggs.append(F.hll_union_agg(F.col(f"sk__{c}")).alias(f"sk__{c}"))
    for c in sum_cols:
        aggs.append(F.sum(f"sum__{c}").alias(f"sum__{c}"))
        aggs.append(F.min(f"min__{c}").alias(f"min__{c}"))
        aggs.append(F.max(f"max__{c}").alias(f"max__{c}"))
    kll_names = [f"kll__{c}" for c in quantile_cols]
    for n in kll_names:
        aggs.append(F.collect_list(n).alias(f"_list{n}"))
    out = parts.groupBy(key.alias("bucket")).agg(*aggs)
    if not kll_names:
        return out
    keep = [F.col(a) for a in out.columns if not a.startswith("_listkll__")]
    keep += [_kll_fold(F.col(f"_list{n}")).alias(n) for n in kll_names]
    return out.select(*keep)
