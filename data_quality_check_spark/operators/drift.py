"""Categorical distribution drift between two table snapshots (PSI).

The reference profiles one table at a time (engine.py:439-553 recomputes
scores per run); the natural productionization at 10^12 rows is monitoring
HOW the distribution moves between snapshots — yesterday's crawl vs today's,
train vs eval, pre- vs post-filter. The Population Stability Index is the
standard per-category decomposition: psi = Σ (p_a − p_b)·ln(p_a/p_b), with
Laplace smoothing so categories that appear or vanish entirely stay finite.

Scale shape: each side is ONE partial/final hash agg on the category key
(map-side combine does almost all the work — output is K rows, K = category
cardinality); the K-row frames then full-outer join and pick up the 1-row
totals via a broadcast cross join. Nothing after the two aggs touches more
than K rows, so the operator costs two scans — inherent, the snapshots are
different tables — and two tiny exchanges.

Float determinism (driver value-hash): counts stay integer end-to-end; each
probability is ONE double division of exact integers, identical in Spark and
DuckDB; ln/round(…,6) are the only transcendental steps and both engines
round the same correctly-rounded-division inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def categorical_drift(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Per-category drift between snapshot A and snapshot B of `col`.

    Emits ({col}, n_a, n_b, p_a, p_b, psi_term); total PSI = sum(psi_term).
    p's are Laplace-smoothed: (n + 1) / (total + K) with K = distinct
    categories across both snapshots. NULL categories count as a category.
    """
    # null-safe key equality (≡ the twin's IS NOT DISTINCT FROM): a NULL
    # category present on both sides must merge into one row, not two
    ca = df_a.groupBy(F.col(col).alias("_ka")).agg(F.count(F.lit(1)).alias("n_a"))
    cb = df_b.groupBy(F.col(col).alias("_kb")).agg(F.count(F.lit(1)).alias("n_b"))
    return _psi_rows(ca, cb, col)


def categorical_drift_vs_counts(
    ref_counts: DataFrame, df_b: DataFrame, col: str
) -> DataFrame:
    """`categorical_drift` where side A is ALREADY a (col, n_a) count table —
    the frozen-reference shape a recurring monitor should persist once, so
    side A is never rescanned (the same O(increment)-not-O(corpus) contract
    as `SeenCorpusArtifacts`). Output is identical to
    `categorical_drift(ref, df_b, col)` whenever
    `ref_counts = ref.groupBy(col).agg(count(*) as n_a)` (pinned by test)."""
    ca = ref_counts.select(F.col(col).alias("_ka"), F.col("n_a").cast("long"))
    cb = df_b.groupBy(F.col(col).alias("_kb")).agg(F.count(F.lit(1)).alias("n_b"))
    return _psi_rows(ca, cb, col)


def _psi_rows(ca: DataFrame, cb: DataFrame, col: str) -> DataFrame:
    j = ca.join(cb, F.col("_ka").eqNullSafe(F.col("_kb")), "full_outer").select(
        F.coalesce("_ka", "_kb").alias(col),
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    return _psi_terms(j, col)


def _psi_terms(j: DataFrame, col: str) -> DataFrame:
    """Smoothed PSI contributions from a joined (category, n_a, n_b) frame —
    the shared tail of every categorical PSI variant (+1/+k Laplace
    smoothing, 6-dp round, broadcast 1-row totals)."""
    tot = j.agg(
        F.sum("n_a").alias("_ta"),
        F.sum("n_b").alias("_tb"),
        F.count(F.lit(1)).alias("_k"),
    )
    p_a = (F.col("n_a") + 1) / (F.col("_ta") + F.col("_k"))
    p_b = (F.col("n_b") + 1) / (F.col("_tb") + F.col("_k"))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            col,
            "n_a",
            "n_b",
            F.round(p_a, 6).alias("p_a"),
            F.round(p_b, 6).alias("p_b"),
            F.round((p_a - p_b) * F.log(p_a / p_b), 6).alias("psi_term"),
        )
    )


def categorical_drift_sql(rel_a: str, rel_b: str, col: str) -> str:
    """DuckDB twin of `categorical_drift`. `rel_a`/`rel_b` are relation
    expressions (table names or parenthesized subqueries)."""
    return f"""
WITH ca AS (SELECT {col}, count(*) AS n_a FROM {rel_a} GROUP BY {col}),
cb AS (SELECT {col}, count(*) AS n_b FROM {rel_b} GROUP BY {col}),
j AS (
  SELECT coalesce(ca.{col}, cb.{col}) AS {col},
         coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
  FROM ca FULL JOIN cb ON ca.{col} IS NOT DISTINCT FROM cb.{col}
),
tot AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb,
         count(*) AS k
  FROM j
)
SELECT {col}, n_a, n_b,
       round(CAST(n_a + 1 AS DOUBLE) / (ta + k), 6) AS p_a,
       round(CAST(n_b + 1 AS DOUBLE) / (tb + k), 6) AS p_b,
       round((CAST(n_a + 1 AS DOUBLE) / (ta + k)
              - CAST(n_b + 1 AS DOUBLE) / (tb + k))
             * ln((CAST(n_a + 1 AS DOUBLE) / (ta + k))
                  / (CAST(n_b + 1 AS DOUBLE) / (tb + k))), 6) AS psi_term
FROM j, tot
"""


def vocab_drift(df_a: DataFrame, df_b: DataFrame, text_col: str, k: int = 50) -> DataFrame:
    """Token-distribution drift between two corpus snapshots: smoothed PSI
    contributions over the union top-`k` tokens plus an `<other>` residual
    bucket — the vocabulary-level shift monitor (a topic/source/spam change
    moves the token mix long before per-column profiles notice). Standard
    top-k-plus-residual construction so the category space is bounded and
    comparable run-to-run.

    Output: (token, n_a, n_b, p_a, p_b, psi_term), ≤ k+1 rows; the top-k set
    is chosen by combined count with (count DESC, token ASC) tie-break, so
    the k-boundary is deterministic across engines and partitionings.
    Σ psi_term is the headline PSI.

    Scale: two map-side-combined token-count aggs (Zipf head absorbed by
    partial aggregation, the `top_tokens` argument), a vocab-sized full-outer
    count join, TakeOrdered k rows to the driver, then a BROADCAST k-token
    semi-classification and a ≤k+1-key re-agg — the corpus never shuffles
    more than its distinct-token counts, and category rows stay K-sized
    whatever the corpus."""
    from data_quality_check_spark.operators.vocab import TOKEN_RE

    def counts(df: DataFrame, alias: str) -> DataFrame:
        toks = df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
            ).alias("token")
        )
        return toks.groupBy("token").agg(F.count(F.lit(1)).alias(alias))

    j = (
        counts(df_a, "n_a")
        .join(counts(df_b, "n_b"), "token", "full_outer")
        .select(
            "token",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    topk = (
        j.orderBy((F.col("n_a") + F.col("n_b")).desc(), F.col("token").asc())
        .limit(k)
        .select("token")
    )
    classified = j.join(F.broadcast(topk.withColumn("_top", F.lit(True))), "token", "left").select(
        F.when(F.col("_top"), F.col("token")).otherwise(F.lit("<other>")).alias("token"),
        "n_a",
        "n_b",
    )
    cats = classified.groupBy("token").agg(
        F.sum("n_a").alias("n_a"), F.sum("n_b").alias("n_b")
    )
    return _psi_terms(cats, "token")


def vocab_drift_sql(rel_a: str, rel_b: str, text_col: str, k: int = 50) -> str:
    """DuckDB oracle twin of `vocab_drift` (same tokenizer subset, same
    deterministic top-k tie-break, same smoothing)."""
    from data_quality_check_spark.operators.vocab import TOKEN_RE

    def counts(rel: str, alias: str) -> str:
        return f"""(
  SELECT token, count(*) AS {alias} FROM (
    SELECT unnest(regexp_extract_all(lower({text_col}), '{TOKEN_RE}')) AS token
    FROM {rel}
  ) GROUP BY token
)"""

    return f"""
WITH j AS (
  SELECT coalesce(ca.token, cb.token) AS token,
         coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
  FROM {counts(rel_a, 'n_a')} ca FULL JOIN {counts(rel_b, 'n_b')} cb
       ON ca.token = cb.token
),
topk AS (SELECT token FROM j ORDER BY n_a + n_b DESC, token ASC LIMIT {k}),
cats AS (
  SELECT CASE WHEN t.token IS NOT NULL THEN j.token ELSE '<other>' END AS token,
         CAST(sum(n_a) AS BIGINT) AS n_a, CAST(sum(n_b) AS BIGINT) AS n_b
  FROM j LEFT JOIN topk t ON j.token = t.token
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb,
         count(*) AS kk
  FROM cats
)
SELECT token, n_a, n_b,
       round(CAST(n_a + 1 AS DOUBLE) / (ta + kk), 6) AS p_a,
       round(CAST(n_b + 1 AS DOUBLE) / (tb + kk), 6) AS p_b,
       round((CAST(n_a + 1 AS DOUBLE) / (ta + kk)
              - CAST(n_b + 1 AS DOUBLE) / (tb + kk))
             * ln((CAST(n_a + 1 AS DOUBLE) / (ta + kk))
                  / (CAST(n_b + 1 AS DOUBLE) / (tb + kk))), 6) AS psi_term
FROM cats, tot
"""


def numeric_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    bins: int = 16,
    edges: "tuple[float, float] | None" = None,
) -> DataFrame:
    """Binned PSI between two snapshots of a numeric column.

    Fixed-width bins over [mn, mx]; NULL values form their own category (the
    Laplace smoothing in `categorical_drift` keeps every term finite). Output:
    (bin, lo, hi, n_a, n_b, p_a, p_b, psi_term); total PSI = sum(psi_term).

    Scale shape: with `edges` given (the production monitoring path — reuse
    yesterday's edges so bins are comparable across runs), each side is ONE
    map-side-combined agg on a computed bin key, exactly like the categorical
    op. With edges=None the span is derived from a union-scan of both inputs
    first (2 scans/side total) — fine for ad-hoc, documented cost at scale.

    Float determinism: the bin index is floor(((x - mn) * bins) / (mx - mn))
    with that exact association in both engines — every step is a single IEEE
    double op on identical inputs, so the integer bin is bit-identical.
    """
    v = F.col(col).cast("double")
    if edges is None:
        span = (
            df_a.select(v.alias("_v"))
            .unionAll(df_b.select(v.alias("_v")))
            .agg(F.min("_v").alias("_mn"), F.max("_v").alias("_mx"))
        )
    else:
        mn, mx = edges
        span = df_a.sparkSession.range(1).select(
            F.lit(float(mn)).alias("_mn"), F.lit(float(mx)).alias("_mx")
        )

    def _binned(df: DataFrame) -> DataFrame:
        idx = F.floor(((v - F.col("_mn")) * F.lit(float(bins))) / (F.col("_mx") - F.col("_mn")))
        return df.crossJoin(F.broadcast(span)).select(
            F.when(v.isNull(), F.lit(None).cast("long"))
            .when(F.col("_mx") == F.col("_mn"), F.lit(0).cast("long"))
            .otherwise(F.greatest(F.least(idx, F.lit(bins - 1)), F.lit(0)).cast("long"))
            .alias("bin")
        )

    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(bins))
    return (
        categorical_drift(_binned(df_a), _binned(df_b), "bin")
        .crossJoin(F.broadcast(span))
        .select(
            "bin",
            F.round(F.col("_mn") + F.col("bin").cast("double") * width, 6).alias("lo"),
            F.round(F.col("_mn") + (F.col("bin") + 1).cast("double") * width, 6).alias("hi"),
            "n_a",
            "n_b",
            "p_a",
            "p_b",
            "psi_term",
        )
    )


def numeric_drift_sql(
    rel_a: str,
    rel_b: str,
    col: str,
    bins: int = 16,
    edges: "tuple[float, float] | None" = None,
) -> str:
    """DuckDB twin of `numeric_drift`. The bin expression keeps the exact
    association of the Spark build — see the operator's float-determinism
    note. `edges` mirrors the operator's frozen-edges production path: the
    span becomes two literals instead of the union-scan subquery."""
    b = float(bins)
    if edges is not None:
        mn, mx = edges
        span = f"(SELECT {float(mn)!r} AS _mn, {float(mx)!r} AS _mx)"
    else:
        span = (
            f"(SELECT min(_v) AS _mn, max(_v) AS _mx FROM ("
            f"SELECT CAST({col} AS DOUBLE) AS _v FROM {rel_a} "
            f"UNION ALL SELECT CAST({col} AS DOUBLE) AS _v FROM {rel_b}))"
        )

    def binned(rel: str) -> str:
        idx = f"CAST(floor(((CAST({col} AS DOUBLE) - _mn) * {b}) / (_mx - _mn)) AS BIGINT)"
        return (
            f"(SELECT CASE WHEN {col} IS NULL THEN NULL "
            f"WHEN _mx = _mn THEN 0 "
            f"ELSE greatest(least({idx}, {bins - 1}), 0) END AS bin "
            f"FROM {rel}, {span} AS _sp)"
        )

    psi = categorical_drift_sql(binned(rel_a), binned(rel_b), "bin")
    width = f"((_mx - _mn) / {b})"
    return f"""
SELECT bin,
       round(_mn + CAST(bin AS DOUBLE) * {width}, 6) AS lo,
       round(_mn + CAST(bin + 1 AS DOUBLE) * {width}, 6) AS hi,
       n_a, n_b, p_a, p_b, psi_term
FROM ({psi}) AS _psi, {span} AS _sp
"""


def profile_drift(
    df_a: DataFrame, df_b: DataFrame, cols: "list[str]", exact_distinct: bool = True
) -> DataFrame:
    """Per-column shape diff between two snapshots: row/null/distinct counts
    and null rates, one output row per profiled column.

    The "did today's batch change shape" monitor the reference's per-run
    rescoring (engine.py:439-553) implies but never materializes. Scale
    shape: ONE fused agg per side (all null counts + distincts in a single
    pass), a 1-row × 1-row cross join, then a stack() to K rows — nothing
    after the two scans exceeds K = len(cols). Exact multi-distinct costs a
    Catalyst EXPAND (×K scan width) like the profiler's exact mode; pass
    exact_distinct=False for the HLL sketch at production scale.
    """

    # Column names are DATA-derived (CSV headers): a name like "it's" or
    # "a`b" must neither break name resolution nor the stack() expression.
    # Every by-name access path in Spark PARSES the name (backticks, dots), so
    # the sides are positionally renamed via toDF — no parsing anywhere — and
    # all derived aliases are INDEX-keyed; only the display literal carries
    # the raw name, escaped as a Spark string literal.
    def _side(df: DataFrame, suf: str) -> DataFrame:
        pos = {c: i for i, c in enumerate(df.columns)}
        missing = [c for c in cols if c not in pos]
        if missing:
            raise ValueError(f"columns not in frame: {missing}")
        r = df.toDF(*[f"_c{i}" for i in range(len(df.columns))])
        aggs = [F.count(F.lit(1)).alias(f"rows{suf}")]
        for j, c in enumerate(cols):
            col = F.col(f"_c{pos[c]}")
            aggs.append(
                F.coalesce(F.sum(F.isnull(col).cast("long")), F.lit(0)).alias(f"nulls_{j}{suf}")
            )
            dist = F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
            aggs.append(dist.alias(f"dist_{j}{suf}"))
        return r.agg(*aggs)

    one = _side(df_a, "_a").crossJoin(_side(df_b, "_b"))

    def _lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack = ", ".join(
        f"{_lit(c)}, nulls_{j}_a, dist_{j}_a, nulls_{j}_b, dist_{j}_b"
        for j, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column_name, nulls_a, distinct_a, nulls_b, distinct_b)"
        ),
        "rows_a",
        "rows_b",
    ).select(
        "column_name",
        "rows_a",
        "rows_b",
        "nulls_a",
        "nulls_b",
        F.round(F.col("nulls_a") / F.nullif(F.col("rows_a"), F.lit(0)), 6).alias("null_rate_a"),
        F.round(F.col("nulls_b") / F.nullif(F.col("rows_b"), F.lit(0)), 6).alias("null_rate_b"),
        "distinct_a",
        "distinct_b",
        (F.col("distinct_b") - F.col("distinct_a")).alias("distinct_delta"),
    )


def profile_drift_sql(rel_a: str, rel_b: str, cols: "list[str]") -> str:
    """DuckDB twin of `profile_drift` (exact-distinct form)."""

    def side(rel: str, suf: str) -> str:
        parts = [f"count(*) AS rows{suf}"]
        for c in cols:
            parts.append(
                f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0)"
                f" AS BIGINT) AS nulls_{c}{suf}"
            )
            parts.append(f"count(DISTINCT {c}) AS dist_{c}{suf}")
        return f"(SELECT {', '.join(parts)} FROM {rel})"

    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, rows_a, rows_b, nulls_{c}_a AS nulls_a, "
        f"nulls_{c}_b AS nulls_b, "
        f"round(nulls_{c}_a / nullif(rows_a, 0), 6) AS null_rate_a, "
        f"round(nulls_{c}_b / nullif(rows_b, 0), 6) AS null_rate_b, "
        f"dist_{c}_a AS distinct_a, dist_{c}_b AS distinct_b, "
        f"dist_{c}_b - dist_{c}_a AS distinct_delta FROM both_sides"
        for c in cols
    )
    return (
        f"WITH both_sides AS (SELECT * FROM {side(rel_a, '_a')} AS _a, "
        f"{side(rel_b, '_b')} AS _b)\n{rows}"
    )


def time_split_mid(df: DataFrame, ts_col: str) -> DataFrame:
    """1-row frame with the integer-µs midpoint of [min(ts), max(ts)] — the
    deterministic split key for drift-over-time demos/tests (production use
    passes two genuine snapshots instead)."""
    # cast handles TIMESTAMP_NTZ inputs; the session pins UTC so the cast is
    # an identity on the stored microseconds (matching DuckDB's epoch_us)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return df.agg(
        F.min(us).alias("_mn"),
        F.max(us).alias("_mx"),
    ).select(F.expr("(_mn + _mx) DIV 2").alias("_mid"))


def snapshot_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """JOIN-FREE set-overlap estimates between two snapshots' key sets
    (DataSketches theta sketches): |A|, |B|, |A∩B|, |A∪B|, |A\\B|, |B\\A| and
    the Jaccard similarity, in one row.

    The monitoring companion to `dedup_incremental`: "how much of today's
    crawl is yesterday's corpus" answered WITHOUT shuffling a single key —
    each side runs one map-side-combined sketch aggregate (a few KB of state
    per task), and the set algebra happens on two sketch blobs in a 1×1 cross
    join. At 10^12 keys an exact answer needs a full-corpus join; this needs
    two columnar scans that also parallelize across snapshots already stored
    on different clusters (ship the sketch, not the data). Estimates carry
    ~1/sqrt(2^lg_k) relative error (~0.8% at the default) — pinned within 2%
    of exact by tests; run `dedup_incremental` when exact decisions are
    needed, this when a dashboard needs the trend.
    """
    sa = df_a.agg(F.theta_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("_sa"))
    sb = df_b.agg(F.theta_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("_sb"))
    one = sa.crossJoin(sb)
    inter = F.theta_sketch_estimate(F.theta_intersection("_sa", "_sb"))
    union = F.theta_sketch_estimate(F.theta_union("_sa", "_sb"))
    return one.select(
        F.theta_sketch_estimate("_sa").cast("long").alias("n_a_est"),
        F.theta_sketch_estimate("_sb").cast("long").alias("n_b_est"),
        inter.cast("long").alias("overlap_est"),
        union.cast("long").alias("union_est"),
        F.theta_sketch_estimate(F.theta_difference("_sa", "_sb")).cast("long").alias("a_only_est"),
        F.theta_sketch_estimate(F.theta_difference("_sb", "_sa")).cast("long").alias("b_only_est"),
        F.round(inter / union, 4).alias("jaccard_est"),
    )


def key_skew(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Pre-shuffle skew audit for a prospective join/agg key: the `top_n`
    heaviest keys with their row counts, corpus fraction, and multiple of the
    mean group size. The decision input for salting / AQE skew-join tuning —
    at 10^12 rows you run THIS before keying a shuffle on a column, because a
    key carrying 5% of the corpus turns a 1000-executor stage into one straggler.

    Emits (rank, {key_col}, cnt, frac_rows, x_mean): `frac_rows` = share of
    all rows on that key, `x_mean` = cnt / (total/keys) — how many times an
    average group. NULL keys count as a key (they hash-partition together
    exactly like any hot value). Ties in cnt break on the key value, so the
    top-N boundary is engine-deterministic.

    Plan shape: ONE partial/final hash agg on the key (map-side combine —
    ironically immune to the skew it measures, combiners shrink the hot key
    per task before the exchange); the 1-row totals agg re-reads the same
    exchange (ReusedExchange — the grouped frame feeds both consumers with an
    identical exchange, as in `categorical_drift`); broadcast cross-join of
    the totals row; global top-N via orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition heaps, no global sort); the rank
    window runs on the ≤ top_n collected rows.

    Float determinism: frac_rows / x_mean are each ONE double division (or a
    double ratio of exact longs) rounded to 6/4 dp — identical in DuckDB.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_keys")
    )
    top = (
        counts.crossJoin(F.broadcast(tot))
        .orderBy(F.col("cnt").desc(), F.col(key_col).asc_nulls_first())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col).asc_nulls_first())
    return top.select(
        F.row_number().over(w).alias("rank"),
        key_col,
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("_total"), 6).alias("frac_rows"),
        F.round(
            F.col("cnt").cast("double")
            / (F.col("_total").cast("double") / F.col("_keys")),
            4,
        ).alias("x_mean"),
    )


def key_skew_sql(table: str, key_col: str, top_n: int = 20) -> str:
    """DuckDB twin of `key_skew` (same tie-break, same single-division
    rounding; NULLS FIRST matches Spark's asc_nulls_first)."""
    return f"""
WITH counts AS (
  SELECT {key_col}, count(*) AS cnt FROM {table} GROUP BY {key_col}
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS _total, count(*) AS _keys FROM counts
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, {key_col} ASC NULLS FIRST) AS INT)
         AS rank,
       {key_col},
       cnt,
       round(CAST(cnt AS DOUBLE) / _total, 6) AS frac_rows,
       round(CAST(cnt AS DOUBLE) / (CAST(_total AS DOUBLE) / _keys), 4) AS x_mean
FROM counts, tot
ORDER BY cnt DESC, {key_col} ASC NULLS FIRST
LIMIT {top_n}
"""


def snapshot_diff(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str,
    content_cols: "list[str]",
) -> DataFrame:
    """Corpus reconciliation between two snapshots (yesterday's published
    corpus vs today's): classify every id as added / removed / changed /
    unchanged and report counts with an example id per class — the diff a
    write-audit-publish pipeline reviews before promoting v(n+1), and the
    parquet-side analogue of an Iceberg changelog scan.

    `content_cols` must be string/integer columns: the row fingerprint is
    md5 over a unit-separator concat with a NUL-ish null sentinel, and
    int→string casts render identically in Spark and DuckDB (float casts do
    NOT — fingerprint a pre-rounded string column instead).

    Output: (change, n_rows, example_{id_col}) — change ∈ added/removed/
    changed/unchanged; classes with zero rows are absent.

    100 TB shape: each side is ONE narrow projection (id, fingerprint) —
    content never shuffles, only 32-char hex digests (unhex to 16-byte
    binary halves that if it ever matters); the full-outer join
    shuffles both digest tables by id (on bucketed TableIO corpora the join
    is co-partitioned and shuffle-free); the classification agg is 4 keys
    with map-side combine. example = min(id) keeps the output driver-sized
    and deterministic."""
    sep, nul = "\x1f", "\x00null\x00"

    def fp(df: DataFrame, name: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit(nul)) for c in content_cols
        ]
        return df.select(
            F.col(id_col), F.md5(F.concat_ws(sep, *parts)).alias(name)
        )

    j = fp(df_a, "_fa").join(fp(df_b, "_fb"), on=id_col, how="full_outer")
    change = (
        F.when(F.col("_fa").isNull(), F.lit("added"))
        .when(F.col("_fb").isNull(), F.lit("removed"))
        .when(F.col("_fa") == F.col("_fb"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(F.col(id_col), change.alias("change"))
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(id_col).alias(f"example_{id_col}"),
        )
    )


def snapshot_diff_sql(
    rel_a: str, rel_b: str, id_col: str, content_cols: "list[str]"
) -> str:
    """DuckDB twin of snapshot_diff (identical separator/sentinel/md5)."""

    def fp(rel: str) -> str:
        parts = ", ".join(
            f"COALESCE(CAST({c} AS VARCHAR), chr(0) || 'null' || chr(0))"
            for c in content_cols
        )
        return (
            f"SELECT {id_col}, md5(concat_ws(chr(31), {parts})) AS f FROM {rel}"
        )

    return f"""
WITH a AS ({fp(rel_a)}), b AS ({fp(rel_b)}),
j AS (
  SELECT COALESCE(a.{id_col}, b.{id_col}) AS {id_col},
         CASE WHEN a.f IS NULL THEN 'added'
              WHEN b.f IS NULL THEN 'removed'
              WHEN a.f = b.f THEN 'unchanged'
              ELSE 'changed' END AS change
  FROM a FULL OUTER JOIN b ON a.{id_col} = b.{id_col}
)
SELECT change, count(*) AS n_rows, min({id_col}) AS example_{id_col}
FROM j GROUP BY change
"""


def ks_statistic(binned: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance from a `numeric_drift` binned
    output — the classic drift TEST STATISTIC next to PSI's divergence score
    (binned-ECDF KS: exact for the given binning; finer bins → closer to the
    exact-sample KS). NULL bins (NULL values) are excluded — KS is a statement
    about observed value distributions.

    Output 1 row: (n_a, n_b, ks) with ks = round(max_bin |cumA/nA − cumB/nB|,
    6); an empty side yields ks NULL, and ALWAYS exactly one row — both
    sides all-NULL gives (0, 0, NULL), never zero rows. Cross-engine
    determinism: each bin's
    term is the SAME three IEEE ops (two divisions of exact int64 counts, one
    subtraction) in both engines, so the max and the 6-dp round agree
    bit-for-bit.

    Scale shape: runs on the K-row binned frame (K = bins) — cumulative
    window, 1-row totals, max aggregate; cost is O(bins) regardless of
    corpus size."""
    from pyspark.sql import Window

    rows = binned.filter(F.col("bin").isNotNull()).select("bin", "n_a", "n_b")
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = rows.withColumn("_ca", F.sum("n_a").over(w)).withColumn(
        "_cb", F.sum("n_b").over(w)
    )
    # ALWAYS one output row, even when every value was NULL (no non-null
    # bins): totals and the max-term are both no-groupBy aggregates — an
    # empty input still yields one row (counts 0, ks NULL) — rather than a
    # groupBy over the empty frame vanishing to zero rows
    tot = rows.agg(
        F.coalesce(F.sum("n_a"), F.lit(0)).alias("_ta"),
        F.coalesce(F.sum("n_b"), F.lit(0)).alias("_tb"),
    )
    # try_divide: an empty side (zero total) yields NULL — matching DuckDB's
    # nullif-guarded division — instead of ANSI-mode throwing
    term = F.abs(
        F.try_divide(F.col("_ca").cast("double"), F.col("_ta"))
        - F.try_divide(F.col("_cb").cast("double"), F.col("_tb"))
    )
    mx = c.crossJoin(F.broadcast(tot)).agg(F.round(F.max(term), 6).alias("ks"))
    return tot.crossJoin(F.broadcast(mx)).select(
        F.col("_ta").alias("n_a"), F.col("_tb").alias("n_b"), "ks"
    )


def ks_statistic_sql(binned_sql: str) -> str:
    """DuckDB twin of ks_statistic over any query emitting (bin, n_a, n_b) —
    e.g. numeric_drift_sql(...)."""
    return f"""
WITH _ks_binned AS ({binned_sql}),
nn AS (SELECT bin, n_a, n_b FROM _ks_binned WHERE bin IS NOT NULL),
c AS (SELECT bin,
             sum(n_a) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS ca,
             sum(n_b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cb
      FROM nn),
t AS (SELECT CAST(COALESCE(sum(n_a), 0) AS BIGINT) AS ta,
             CAST(COALESCE(sum(n_b), 0) AS BIGINT) AS tb FROM nn),
m AS (SELECT round(max(abs(CAST(c.ca AS DOUBLE) / nullif(t.ta, 0)
                           - CAST(c.cb AS DOUBLE) / nullif(t.tb, 0))), 6) AS ks
      FROM c, t)
SELECT t.ta AS n_a, t.tb AS n_b, m.ks FROM t, m
"""
