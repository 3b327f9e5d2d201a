"""Temporal join operators: boundary, tie, unmatched, and null-ts semantics."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_quality_check_spark.operators.temporal import asof_join, range_join_bucketed


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            (7, _ts(10, 0), 1.5),
            (7, _ts(10, 30), 2.5),
            (8, _ts(9, 30), 9.0),
        ],
        "u long, ts timestamp, v double",
    )


def test_asof_backward_inclusive(spark, quotes):
    left = spark.createDataFrame(
        [
            (1, 7, _ts(10, 0)),   # exactly on a right ts → inclusive match
            (2, 7, _ts(11, 0)),   # after both → latest (10:30)
            (3, 7, _ts(10, 15)),  # between → 10:00
            (4, 8, _ts(9, 0)),    # before any right row → null
            (5, 9, _ts(12, 0)),   # key with no right rows → null
        ],
        "id long, u long, ts timestamp",
    )
    got = {r.id: (r.matched_ts, r.v) for r in asof_join(left, quotes, "ts", "u").collect()}
    assert got[1] == (_ts(10, 0), 1.5)
    assert got[2] == (_ts(10, 30), 2.5)
    assert got[3] == (_ts(10, 0), 1.5)
    assert got[4] == (None, None)
    assert got[5] == (None, None)
    assert len(got) == 5  # left-join cardinality: exactly one row per left row


def test_asof_values_come_from_one_right_row(spark):
    """Multiple right value columns must arrive atomically (struct carry), not
    independently carried per column across different right rows."""
    right = spark.createDataFrame(
        [(7, _ts(9), "a", None), (7, _ts(10), None, 42)],
        "u long, ts timestamp, s string, k int",
    )
    left = spark.createDataFrame([(1, 7, _ts(11))], "id long, u long, ts timestamp")
    row = asof_join(left, right, "ts", "u").collect()[0]
    # latest right row is (10:00, NULL, 42): s must be NULL, not carried from 9:00
    assert row.matched_ts == _ts(10) and row.k == 42 and row.s is None


def test_asof_drops_null_ts_right_rows(spark, quotes):
    dirty = quotes.union(
        quotes.sparkSession.createDataFrame([(7, None, 99.0)], "u long, ts timestamp, v double")
    )
    left = spark.createDataFrame([(1, 7, _ts(9, 59))], "id long, u long, ts timestamp")
    row = asof_join(left, dirty, "ts", "u").collect()[0]
    assert row.v is None  # 9:59 precedes all real quotes; null-ts row never matches


def test_range_join_boundaries(spark):
    intervals = spark.createDataFrame(
        [(100, 7, _ts(10, 0), _ts(10, 30))],
        "iid long, u long, start_ts timestamp, end_ts timestamp",
    )
    pts = spark.createDataFrame(
        [
            (1, 7, _ts(10, 0)),       # == start → in (inclusive)
            (2, 7, _ts(10, 29, 59)),  # inside
            (3, 7, _ts(10, 30)),      # == end → out (exclusive)
            (4, 8, _ts(10, 15)),      # wrong key → out
            (5, 7, _ts(9, 59, 59)),   # before → out
        ],
        "id long, u long, ts timestamp",
    )
    got = sorted(
        r.id
        for r in range_join_bucketed(
            pts, intervals, "ts", "start_ts", "end_ts", by="u", bucket="30 minutes"
        ).collect()
    )
    assert got == [1, 2]


def test_range_join_interval_spanning_many_buckets(spark):
    """An interval wider than the bucket must still catch points in every
    covered bucket (the explode covers start..end inclusive of partial edges)."""
    intervals = spark.createDataFrame(
        [(1, _ts(10, 5), _ts(12, 35))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    pts = spark.createDataFrame(
        [(i, _ts(10 + i, 10)) for i in range(3)], "id long, ts timestamp"
    )  # 10:10, 11:10, 12:10 — all inside
    got = range_join_bucketed(pts, intervals, "ts", "start_ts", "end_ts", bucket="1 hour")
    assert sorted(r.id for r in got.collect()) == [0, 1, 2]


def test_range_join_end_on_bucket_boundary(spark):
    """end exactly on a bucket boundary must not explode an extra empty bucket
    nor lose the final partial bucket."""
    intervals = spark.createDataFrame(
        [(1, _ts(10, 0), _ts(11, 0))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    pts = spark.createDataFrame(
        [(1, _ts(10, 59, 59)), (2, _ts(11, 0))], "id long, ts timestamp"
    )
    got = range_join_bucketed(pts, intervals, "ts", "start_ts", "end_ts", bucket="1 hour")
    assert [r.id for r in got.collect()] == [1]


def test_joins_reject_output_name_collisions(spark, quotes):
    left_clash = spark.createDataFrame([(1, 7, _ts(10), 0.0)], "id long, u long, ts timestamp, v double")
    with pytest.raises(ValueError, match="collision"):
        asof_join(left_clash, quotes, "ts", "u")  # right value col `v` exists on left
    with pytest.raises(ValueError, match="collision"):
        range_join_bucketed(
            left_clash,
            left_clash.selectExpr("id", "u", "ts AS start_ts", "ts AS end_ts", "v"),
            "ts", "start_ts", "end_ts", by="u",
        )  # right carries id/v which exist on left


def test_reserved_internal_names_rejected(spark):
    """Inputs already carrying the helpers' internal column names must raise
    instead of producing ambiguous references or silently corrupted output."""
    import pytest
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators.temporal import asof_join, range_join_bucketed

    base = spark.range(3).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("ts"),
        F.lit(1).alias("v"),
    )
    right = spark.range(3).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("ts"),
        F.lit(2).alias("rv"),
    )
    for col in ["_side", "_r", "_m", "__ts"]:
        with pytest.raises(ValueError, match="reserves internal"):
            asof_join(base.withColumn(col, F.lit(0)), right, "ts", "k")
        with pytest.raises(ValueError, match="reserves internal"):
            asof_join(base, right.withColumn(col, F.lit(0)), "ts", "k")

    ivals = spark.range(2).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("start"),
        (F.current_timestamp() + F.expr("INTERVAL 1 hour")).alias("end"),
    )
    with pytest.raises(ValueError, match="reserves internal"):
        range_join_bucketed(base.withColumn("_bkt", F.lit(0)), ivals, "ts", "start", "end", by="k")
    with pytest.raises(ValueError, match="reserves internal"):
        range_join_bucketed(base, ivals.withColumn("_bkt", F.lit(0)), "ts", "start", "end", by="k")


def test_sessionize_gap_semantics(spark):
    from data_quality_check_spark.operators.temporal import sessionize

    rows = [
        (1, 10, "2024-01-01 00:00:00"),
        (2, 10, "2024-01-01 00:10:00"),   # 10 min gap → same session
        (3, 10, "2024-01-01 01:00:00"),   # 50 min gap → new session
        (4, 20, "2024-01-01 00:00:00"),   # other user, own session numbering
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(df, "user_id", "ts", "event_id", gap_minutes=30).collect()
    got = {(r.user_id, r.session_id): (r.n_events, r.start_us, r.end_us) for r in out}
    assert set(got) == {(10, 1), (10, 2), (20, 1)}
    assert got[(10, 1)][0] == 2 and got[(10, 2)][0] == 1 and got[(20, 1)][0] == 1
    # session bounds are the member events' min/max µs
    assert got[(10, 1)][1] < got[(10, 1)][2] < got[(10, 2)][1]


def test_sessionize_excludes_null_timestamps_and_matches_twin(spark):
    """NULL timestamps belong to no gap-defined session — and the engines even
    disagree on where NULL sorts in a window (Spark NULLS FIRST, DuckDB
    NULLS LAST), so both twins exclude them by the same predicate."""
    import duckdb
    import pandas as pd

    from data_quality_check_spark.operators.temporal import sessionize, sessionize_sql

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "event_id": [10, 11, 12, 13],
            "ts": pd.to_datetime(
                ["2026-01-01 00:00", None, "2026-01-01 00:10", "2026-01-01 02:00"]
            ),
        }
    )
    got = (
        sessionize(spark.createDataFrame(pdf), "user_id", "ts", "event_id", 30)
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert got["n_events"].sum() == 3  # the null-ts event is gone
    assert list(got["n_events"]) == [2, 1]  # 00:00+00:10 | 02:00
    duckdb.register("ev", pdf)
    want = (
        duckdb.sql(sessionize_sql("ev", "user_id", "ts", "event_id", 30))
        .df()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert (got[["session_id", "n_events", "start_us", "end_us"]].values
            == want[["session_id", "n_events", "start_us", "end_us"]].values).all()
