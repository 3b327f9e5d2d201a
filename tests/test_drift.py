"""Categorical PSI drift: smoothing, null-key merge, zero-drift identity."""

import math

from pyspark.sql import functions as F

from data_quality_check_spark.operators import drift as DR

from data_quality_check_spark.operators.drift import (
    categorical_drift,
    numeric_drift,
    profile_drift,
    time_split_mid,
)


def _df(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "cat string")


def test_identical_snapshots_zero_psi(spark):
    a = _df(spark, ["x"] * 5 + ["y"] * 3)
    out = categorical_drift(a, a, "cat").collect()
    assert {r.cat for r in out} == {"x", "y"}
    for r in out:
        assert r.n_a == r.n_b and r.p_a == r.p_b
        assert r.psi_term == 0.0


def test_appearing_and_vanishing_categories_stay_finite(spark):
    a = _df(spark, ["x"] * 4 + ["gone"] * 2)
    b = _df(spark, ["x"] * 4 + ["new"] * 2)
    got = {r.cat: r for r in categorical_drift(a, b, "cat").collect()}
    assert set(got) == {"x", "gone", "new"}
    assert got["gone"].n_b == 0 and got["new"].n_a == 0
    for r in got.values():
        assert math.isfinite(r.psi_term)
        assert 0.0 < r.p_a < 1.0 and 0.0 < r.p_b < 1.0
    # the vanished category's mass moved A→B-smoothed-floor: positive term
    assert got["gone"].psi_term > 0 and got["new"].psi_term > 0


def test_null_category_merges_to_one_row(spark):
    a = _df(spark, ["x", None, None])
    b = _df(spark, ["x", None])
    out = categorical_drift(a, b, "cat").collect()
    assert len(out) == 2  # not 3: NULL on both sides is ONE category
    null_row = next(r for r in out if r.cat is None)
    assert (null_row.n_a, null_row.n_b) == (2, 1)


def test_laplace_probabilities_sum_to_one(spark):
    a = _df(spark, ["x"] * 7 + ["y"] * 2 + ["z"])
    b = _df(spark, ["x"] * 3 + ["w"] * 3)
    rows = categorical_drift(a, b, "cat").collect()
    # (n_i + 1) / (total + K) over all K categories sums to exactly 1
    assert abs(sum(r.p_a for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_b for r in rows) - 1.0) < 1e-4


def test_categorical_drift_vs_counts_matches_recompute(spark):
    """The frozen-counts overload is output-identical to the recompute path
    whenever ref_counts = ref.groupBy(col).count() — the contract its
    docstring pins. Includes a NULL category and an appearing/vanishing
    category so the full_outer merge path is exercised on both sides."""
    from data_quality_check_spark.operators.drift import categorical_drift_vs_counts

    a = _df(spark, ["x"] * 4 + ["gone"] * 2 + [None])
    b = _df(spark, ["x"] * 3 + ["new"] * 2 + [None, None])
    ref_counts = a.groupBy("cat").agg(F.count(F.lit(1)).alias("n_a"))
    key = lambda t: (t[0] is None, t)  # noqa: E731 — None sorts last
    want = sorted(map(tuple, categorical_drift(a, b, "cat").collect()), key=key)
    got = sorted(
        map(tuple, categorical_drift_vs_counts(ref_counts, b, "cat").collect()), key=key
    )
    assert got == want


def _num_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x double")


def test_numeric_drift_zero_on_identical_snapshots(spark):
    a = _num_df(spark, [float(i) for i in range(32)])
    rows = numeric_drift(a, a, "x", bins=8).collect()
    assert all(r.psi_term == 0.0 for r in rows)
    assert {r.bin for r in rows} == set(range(8))  # 32 evenly spread values hit all bins


def test_numeric_drift_detects_shift(spark):
    a = _num_df(spark, [float(i) for i in range(100)])
    b = _num_df(spark, [float(i) + 60.0 for i in range(100)])
    rows = numeric_drift(a, b, "x", bins=8).collect()
    assert sum(r.psi_term for r in rows) > 0.25  # standard "significant drift" bar
    lo_bin = next(r for r in rows if r.bin == 0)
    assert lo_bin.n_a > 0 and lo_bin.n_b == 0  # B vacated the low bins


def test_numeric_drift_max_value_lands_in_top_bin(spark):
    a = _num_df(spark, [0.0, 10.0])
    rows = numeric_drift(a, a, "x", bins=4).collect()
    assert {r.bin for r in rows} == {0, 3}
    top = next(r for r in rows if r.bin == 3)
    assert (top.lo, top.hi) == (7.5, 10.0)


def test_numeric_drift_null_and_degenerate_span(spark):
    a = _num_df(spark, [5.0, 5.0, None])
    b = _num_df(spark, [5.0])
    rows = numeric_drift(a, b, "x", bins=4).collect()
    got = {r.bin: r for r in rows}
    assert set(got) == {0, None}  # mx == mn → everything in bin 0; NULLs separate
    assert (got[0].n_a, got[0].n_b) == (2, 1)
    assert (got[None].n_a, got[None].n_b) == (1, 0)


def test_numeric_drift_precomputed_edges_match_derived(spark):
    a = _num_df(spark, [float(i) for i in range(50)])
    b = _num_df(spark, [float(i) * 0.5 for i in range(50)])
    derived = sorted(map(tuple, numeric_drift(a, b, "x", bins=8).collect()))
    fixed = sorted(map(tuple, numeric_drift(a, b, "x", bins=8, edges=(0.0, 49.0)).collect()))
    assert derived == fixed


def test_profile_drift_counts_and_deltas(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y"), (4, "y")], "id long, s string"
    )
    b = spark.createDataFrame([(1, None), (2, None), (3, "z")], "id long, s string")
    got = {r.column_name: r for r in profile_drift(a, b, ["id", "s"]).collect()}
    assert set(got) == {"id", "s"}
    assert (got["s"].rows_a, got["s"].rows_b) == (4, 3)
    assert (got["s"].nulls_a, got["s"].nulls_b) == (1, 2)
    assert got["s"].null_rate_a == 0.25 and abs(got["s"].null_rate_b - 2 / 3) < 1e-5
    assert (got["s"].distinct_a, got["s"].distinct_b) == (2, 1)
    assert got["s"].distinct_delta == -1
    assert got["id"].distinct_delta == -1 and got["id"].nulls_a == 0


def test_profile_drift_empty_side_is_finite(spark):
    a = spark.createDataFrame([(1, "x")], "id long, s string")
    b = a.filter(F.lit(False))
    got = {r.column_name: r for r in profile_drift(a, b, ["s"]).collect()}
    r = got["s"]
    assert (r.rows_b, r.nulls_b, r.distinct_b) == (0, 0, 0)
    assert r.null_rate_b is None  # 0/0 is undefined, not a crash


def test_profile_drift_approx_mode_runs(spark):
    a = spark.createDataFrame([(i, str(i % 7)) for i in range(100)], "id long, s string")
    got = {r.column_name: r for r in profile_drift(a, a, ["s"], exact_distinct=False).collect()}
    assert abs(got["s"].distinct_a - 7) <= 1  # HLL estimate, tight at tiny n


def test_time_split_mid_is_inclusive_integer_midpoint(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-03 00:00:00",)], "s string"
    ).select(F.to_timestamp("s").alias("ts"))
    [row] = time_split_mid(df, "ts").collect()
    mn = 1704067200 * 10**6
    mx = mn + 2 * 86400 * 10**6
    assert row._mid == (mn + mx) // 2


def test_profile_drift_survives_quoted_column_names(spark):
    import pandas as pd

    from data_quality_check_spark.operators.drift import profile_drift

    pdf = pd.DataFrame({"it's": [1, None, 3], "a`b": ["x", "y", None]})
    a = spark.createDataFrame(pdf)
    b = spark.createDataFrame(pdf.iloc[:2])
    got = profile_drift(a, b, ["it's", "a`b"]).toPandas().set_index("column_name")
    assert got.loc["it's", "nulls_a"] == 1 and got.loc["a`b", "nulls_b"] == 0


def test_snapshot_overlap_estimates_within_2pct(spark):
    """Theta-sketch overlap estimates vs exact set arithmetic on a known
    split: every estimate within 2% (the op's documented bound) and the plan
    moves sketches, not keys (no key shuffle; one 1x1 cross join)."""
    from data_quality_check_spark.operators.drift import snapshot_overlap

    a = spark.range(0, 12000).selectExpr("concat('doc', id) AS k")
    b = spark.range(7000, 21000).selectExpr("concat('doc', id) AS k")
    got = snapshot_overlap(a, b, "k").collect()[0]
    exact = {
        "n_a_est": 12000,
        "n_b_est": 14000,
        "overlap_est": 5000,
        "union_est": 21000,
        "a_only_est": 7000,
        "b_only_est": 9000,
    }
    for k, want in exact.items():
        assert abs(got[k] - want) <= 0.02 * want, (k, got[k], want)
    assert abs(got["jaccard_est"] - 5000 / 21000) < 0.01

    plan = snapshot_overlap(a, b, "k")._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_key_skew_exact(spark):
    """Hand-computed skew audit: counts, fractions, multiple-of-mean, NULL
    keys counted as a key, and the cnt-tie broken nulls-first."""
    from data_quality_check_spark.operators.drift import key_skew

    rows = [("a",)] * 4 + [("b",)] * 3 + [(None,)] * 3
    df = spark.createDataFrame(rows, "k string")
    got = [tuple(r) for r in key_skew(df, "k", top_n=3).collect()]
    # total=10, keys=3, mean=10/3
    assert got == [
        (1, "a", 4, 0.4, round(4 / (10 / 3), 4)),
        (2, None, 3, 0.3, round(3 / (10 / 3), 4)),
        (3, "b", 3, 0.3, round(3 / (10 / 3), 4)),
    ]


def test_key_skew_top_n_bounds(spark, sf_dir):
    """On fixture events: at most top_n rows, ranks 1..n, frac_rows sums to
    <=1, ordering is by cnt desc."""
    from data_quality_check_spark.operators.drift import key_skew

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = key_skew(ev, "user_id", top_n=10).collect()
    assert 0 < len(rows) <= 10
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert sum(r.frac_rows for r in rows) <= 1.0 + 1e-9


def test_snapshot_diff_classifies_all_change_kinds(spark):
    """added / removed / changed / unchanged each classified exactly; null
    content hits the sentinel (null ≠ '' ≠ 'null'); integer content col
    participates in the fingerprint."""
    a = spark.createDataFrame(
        [
            (1, "same", 10),
            (2, "gone", 20),
            (3, "old", 30),
            (4, None, 40),
            (5, "null", 50),
            (6, "intchange", 60),
        ],
        "id long, text string, n long",
    )
    b = spark.createDataFrame(
        [
            (1, "same", 10),       # unchanged
            (3, "new", 30),        # changed (text)
            (4, "", 40),           # changed: null → '' must NOT collide
            (5, "null", 50),       # unchanged: literal 'null' ≠ sentinel
            (6, "intchange", 61),  # changed (int col only)
            (7, "fresh", 70),      # added
        ],
        "id long, text string, n long",
    )
    out = {
        r["change"]: r for r in DR.snapshot_diff(a, b, "id", ["text", "n"]).collect()
    }
    assert out["unchanged"]["n_rows"] == 2
    assert out["removed"]["n_rows"] == 1 and out["removed"]["example_id"] == 2
    assert out["changed"]["n_rows"] == 3 and out["changed"]["example_id"] == 3
    assert out["added"]["n_rows"] == 1 and out["added"]["example_id"] == 7


def test_snapshot_diff_content_never_shuffles(spark):
    """Only (id, 16-byte digest) rides the reconciliation join — the content
    columns must be absent from every Exchange's carried schema."""
    from tests.test_plan_quality import _exchange_output_columns

    a = spark.createDataFrame([(1, "x" * 100, 1)], "id long, text string, n long")
    b = spark.createDataFrame([(1, "x" * 100, 1)], "id long, text string, n long")
    df = DR.snapshot_diff(a, b, "id", ["text", "n"])
    exchanges = _exchange_output_columns(df)
    assert exchanges, "expected the full-outer join to shuffle digests"
    for cols in exchanges:
        assert "text" not in cols and "n" not in cols, cols


def test_ks_statistic_hand_computed(spark):
    """KS from a hand-built binned frame: max ECDF gap at the known bin;
    NULL bin excluded; identical distributions give ks 0."""
    rows = [
        (None, 7, 9),  # null-value bin: excluded from KS
        (0, 10, 0),
        (1, 0, 10),
        (2, 10, 10),
    ]
    b = spark.createDataFrame(rows, "bin long, n_a long, n_b long")
    out = DR.ks_statistic(b).collect()[0]
    # ECDFs: A = .5, .5, 1 ; B = 0, .5, 1 → max gap 0.5 at bin 0
    assert (out["n_a"], out["n_b"]) == (20, 20)
    assert out["ks"] == 0.5

    same = spark.createDataFrame([(0, 5, 5), (1, 5, 5)], "bin long, n_a long, n_b long")
    assert DR.ks_statistic(same).collect()[0]["ks"] == 0.0


def test_ks_statistic_empty_side_is_null(spark):
    b = spark.createDataFrame([(0, 5, 0), (1, 5, 0)], "bin long, n_a long, n_b long")
    assert DR.ks_statistic(b).collect()[0]["ks"] is None


def test_ks_statistic_all_null_values_one_row(spark):
    """Both sides entirely NULL (only the NULL bin): still exactly one row —
    (0, 0, NULL) — never an empty frame (review fix)."""
    b = spark.createDataFrame(
        [(None, 5, 7)], "bin long, n_a long, n_b long"
    )
    out = DR.ks_statistic(b).collect()
    assert len(out) == 1
    assert (out[0]["n_a"], out[0]["n_b"], out[0]["ks"]) == (0, 0, None)


def test_numeric_drift_frozen_edges_clamp_and_stability(spark):
    """Frozen edges: out-of-span values clamp into the edge bins; the bin
    layout is identical however the data moves (the cross-run comparability
    the frozen path exists for); no span scan of the inputs is needed."""
    a = spark.createDataFrame([(float(x),) for x in [-5, 0, 1, 9]], "v double")
    b = spark.createDataFrame([(float(x),) for x in [3, 25]], "v double")
    out = {r["bin"]: r for r in numeric_drift(a, b, "v", bins=4, edges=(0.0, 8.0)).collect()}
    assert out[0]["n_a"] == 3  # -5 clamps into bin 0 alongside 0 and 1
    assert out[3]["n_b"] == 1  # 25 clamps into the top bin
    assert out[0]["lo"] == 0.0 and out[3]["hi"] == 8.0


def test_vocab_drift_topk_and_residual(spark):
    """Union top-k selection, <other> residual, and identical-corpus zero
    drift."""
    from data_quality_check_spark.operators import drift as DR

    a = spark.createDataFrame(
        [("alpha alpha beta gamma",), ("alpha delta",)], ["text"]
    )
    b = spark.createDataFrame(
        [("alpha beta beta epsilon",), ("zeta zeta zeta",)], ["text"]
    )
    out = {r["token"]: r.asDict() for r in DR.vocab_drift(a, b, "text", k=3).collect()}
    # combined counts: alpha 4, beta 3, zeta 3, gamma/delta/epsilon 1 each;
    # ties at 3 break token-asc -> topk = {alpha, beta, zeta}
    assert set(out) == {"alpha", "beta", "zeta", "<other>"}
    assert (out["alpha"]["n_a"], out["alpha"]["n_b"]) == (3, 1)
    assert (out["<other>"]["n_a"], out["<other>"]["n_b"]) == (2, 1)
    # identical corpora -> every psi_term is 0
    same = DR.vocab_drift(a, a, "text", k=3).collect()
    assert all(r["psi_term"] == 0.0 for r in same)
    assert all(r["p_a"] == r["p_b"] for r in same)
