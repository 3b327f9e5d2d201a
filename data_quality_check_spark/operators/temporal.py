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

def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Session summaries by inactivity gap — the classic event-log operator:
    a new session starts when the gap since the user's previous event exceeds
    `gap_minutes`. Emits one row per (user, session ordinal) with the event
    count and integer-microsecond start/end (epoch µs — the repo's engine-
    stable timestamp convention). Events with a NULL timestamp are excluded —
    they belong to no gap-defined session.

    Shape: ONE shuffle on the user key serves both windows and the final
    aggregation (same partitioning); the lag → flag → running-sum labeling is
    the standard linear sessionization, skew-bounded by events-per-user.
    Structured Streaming's session_window covers the streaming side
    (streaming/windows.py); this is its batch/backfill twin.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy("ts_us", "_eid")
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = df.select(
        user_col,
        F.col(id_col).alias("_eid"),
        # NTZ → timestamp cast is shift-free under the session's UTC TZ
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        # a NULL timestamp cannot belong to any inactivity-gap session, and
        # the engines would even disagree on WHERE it sorts (Spark windows
        # default NULLS FIRST, DuckDB NULLS LAST — so it would start vs be
        # absorbed into a session, renumbering everything after it); the twin
        # SQL applies the identical predicate
    ).filter(F.col("ts_us").isNotNull())
    lagged = ev.withColumn("_prev", F.lag("ts_us").over(w))
    flagged = lagged.withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull() | (F.col("ts_us") - F.col("_prev") > gap_us), 1
        ).otherwise(0),
    )
    labeled = flagged.withColumn("session_id", F.sum("_new").over(ws))
    return labeled.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


def sessionize_sql(
    table: str, user_col: str, ts_col: str, id_col: str, gap_minutes: int = 30
) -> str:
    """DuckDB twin of `sessionize`."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH e AS (
  SELECT {user_col}, {id_col} AS _eid, epoch_us({ts_col}) AS ts_us FROM {table}
  WHERE {ts_col} IS NOT NULL
),
l AS (
  SELECT *, lag(ts_us) OVER (PARTITION BY {user_col} ORDER BY ts_us, _eid) AS _prev
  FROM e
),
s AS (
  SELECT *, sum(CASE WHEN _prev IS NULL OR ts_us - _prev > {gap_us} THEN 1 ELSE 0 END)
         OVER (PARTITION BY {user_col} ORDER BY ts_us, _eid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM l
)
SELECT {user_col}, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ts_us) AS BIGINT) AS start_us, CAST(max(ts_us) AS BIGINT) AS end_us
FROM s GROUP BY 1, 2
"""
