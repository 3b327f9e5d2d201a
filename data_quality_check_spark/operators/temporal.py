"""Temporal joins Spark lacks as primitives: as-of join and range join.

Both are named in the training-data-ops charter as custom operators to express
as compositions of built-in DataFrame ops (no UDF, no row explosion):

  * `asof_join` — for each left row, the latest right row with
    right.ts <= left.ts per key. NOT an inequality join (O(n·m) blow-up):
    union both sides into one frame, ONE hash shuffle on the key, one
    in-partition sort by (ts, side), and a `last(..., ignorenulls)` running
    window carries the most recent right struct forward onto left rows. This is
    the sort-merge formulation every time-series engine uses; cost is
    union + one shuffle + one sort, identical asymptotics to a regular
    sort-merge join at 10^12 rows.
  * `range_join_bucketed` — left.ts ∈ [right.start, right.end) equi-joined
    through time buckets: the right interval explodes into the O(span/bucket)
    buckets it covers, the join runs on (key, bucket) — hash-joinable and
    AQE-skew-splittable — and an exact containment filter removes bucket-edge
    false positives. The naive theta-join is quadratic; this is linear in
    (rows + interval spans / bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str | list[str],
    right_value_cols: list[str] | None = None,
    matched_ts_alias: str = "matched_ts",
) -> DataFrame:
    """Backward (inclusive) as-of join: left columns + the right value columns
    of the latest right row with `right.ts_col <= left.ts_col`, matched per
    `by` key; unmatched left rows keep nulls (left-join semantics).

    Preconditions: right is unique per (by, ts_col) — pre-aggregate ties
    upstream so every engine picks the same row; right rows with null ts are
    unmatchable and dropped. Right values travel as ONE struct so all matched
    columns come atomically from the same right row.
    """
    by = [by] if isinstance(by, str) else list(by)
    rcols = right_value_cols or [c for c in right.columns if c not in {*by, ts_col}]
    lcols = left.columns
    clash = ({*rcols, matched_ts_alias} & set(lcols)) | ({matched_ts_alias} & set(rcols))
    if clash:
        raise ValueError(f"asof_join output name collision: {sorted(clash)} — alias first")
    # internal helper names: an input already carrying them would produce
    # ambiguous references or silently wrong carries, not the clean error the
    # other collisions get (ADVICE r1)
    reserved = {"_side", "_r", "_m", "__ts"} & (set(lcols) | set(right.columns))
    if reserved:
        raise ValueError(
            f"asof_join reserves internal column names {sorted(reserved)} — rename first"
        )

    rstruct = F.struct(F.col(ts_col).alias("__ts"), *[F.col(c).alias(c) for c in rcols])
    rpart = right.filter(F.col(ts_col).isNotNull()).select(
        *by,
        F.col(ts_col),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in {*by, ts_col}
        ],
        F.lit(0).alias("_side"),
        rstruct.alias("_r"),
    )
    lpart = left.select(
        *by,
        F.col(ts_col),
        *[c for c in lcols if c not in {*by, ts_col}],
        F.lit(1).alias("_side"),
        F.lit(None).cast(rpart.schema["_r"].dataType).alias("_r"),
    )
    # right sorts before left at equal ts (side 0 < 1) → inclusive match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lpart.unionByName(rpart).withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *lcols,
            F.col("_m.__ts").alias(matched_ts_alias),
            *[F.col(f"_m.{c}").alias(c) for c in rcols],
        )
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: str | list[str] | None = None,
    bucket: str = "30 minutes",
) -> DataFrame:
    """Inner range join: left rows with `start <= ts < end` (per optional `by`
    key), executed as an equi-join on time buckets + exact containment filter.

    `bucket` must be a constant interval (e.g. '30 minutes'); choose it near the
    median interval span — each right interval produces span/bucket + 1 rows.
    Output: all left columns + all right columns except the join keys.
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    reserved = {"_bkt"} & (set(left.columns) | set(right.columns))
    if reserved:
        # withColumn would overwrite a user _bkt and drop it at the end (ADVICE r1)
        raise ValueError(
            f"range_join_bucketed reserves internal column names {sorted(reserved)} — rename first"
        )
    step = F.expr(f"INTERVAL {bucket}")
    bucket_of = lambda c: F.window(c, bucket)["start"]  # noqa: E731 — epoch-aligned

    l2 = left.filter(F.col(ts_col).isNotNull()).withColumn("_bkt", bucket_of(F.col(ts_col)))
    r2 = (
        right.filter(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(end_col) > F.col(start_col))
        )
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    bucket_of(F.col(start_col)),
                    # end is exclusive, but an interval ending exactly on a bucket
                    # boundary still overlaps that boundary's predecessor only;
                    # sequence() is inclusive so the last bucket is end-epsilon's
                    bucket_of(F.col(end_col) - F.expr("INTERVAL 1 microsecond")),
                    step,
                )
            ),
        )
    )
    rkeep = [c for c in right.columns if c not in set(by)]
    clash = set(rkeep) & set(left.columns)
    if clash:
        raise ValueError(f"range_join output name collision: {sorted(clash)} — alias first")
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return (
        l2.join(r2.select(*by, "_bkt", *rkeep), [*by, "_bkt"])
        .filter(cond)
        .drop("_bkt")
    )
