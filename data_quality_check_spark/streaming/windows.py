"""Event-time windowed quality metrics with late-data handling.

The reference's "freshness" is a batch staleness probe (max timestamp vs wall
clock, engine.py:417-431); this is its streaming generalization: per-window
completeness / rule-violation counts over event time, correct under
out-of-order arrival via a watermark.

One plan serves both engines: on a batch DataFrame the same `groupBy(window)`
aggregation runs as a normal hash aggregate (watermark skipped — it is a
streaming-only concept), which is also how we test stream/batch equivalence.

Streaming-safe by construction: only conditional counts (no distinct
aggregates, which streaming aggregation forbids), all expressible as partial +
final aggregation over the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_quality_metrics(
    df: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    check_cols: list[str] | None = None,
    rules: list[dict] | None = None,
) -> DataFrame:
    """Per-event-time-window metric rows: row count, per-column null counts,
    per-rule violation counts (rule = {name, condition} with the same `F.expr`
    DSL as the batch profiler — engine.py:445 semantics: null ⇒ no violation).

    Streaming input: apply `withWatermark(ts_col, watermark_delay)` so state
    for windows older than the watermark is finalized and dropped — bounded
    state at any input rate. Batch input: identical results, no watermark.
    """
    check_cols = check_cols if check_cols is not None else [
        c for c in df.columns if c != ts_col
    ]
    rules = rules or []
    # Watermarks reject TIMESTAMP_NTZ; cast in BOTH engines (session tz is
    # pinned to UTC in get_spark) so window boundaries stay identical.
    src = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        src = src.withWatermark(ts_col, watermark_delay)
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in check_cols:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"nulls__{c}"))
    for r in rules:
        cond = F.expr(r["condition"]).cast("boolean")
        aggs.append(F.count_if(~F.coalesce(cond, F.lit(True))).alias(f"viol__{r['name']}"))
    return (
        src.groupBy(F.window(F.col(ts_col), window_duration).alias("win"))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            F.col("rows"),
            *[F.col(f"nulls__{c}") for c in check_cols],
            *[F.col(f"viol__{r['name']}") for r in rules],
        )
    )
