"""DSIR-style data selection: hashed n-gram importance weights over a corpus.

Re-expresses Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, arXiv:2302.03169) as a two-pass Spark job: fit bag-of-hashed-unigram
multinomials for a TARGET subset and the RAW pool, then score every raw
document by its log importance ratio Σ_tokens log(p_target / p_raw) and keep
the top-k. The reference repo has no corpus-selection counterpart (its scope
is per-table profiling, engine.py:1-120); this operator is part of the
brief-mandated LLM-training-data surface.

Scale design (100 TB):
  * tokenize + bucket is ONE JVM projection (`regexp_extract_all` + `explode`
    + md5-prefix modulo) — no Python, no UDF;
  * the model fit is a groupBy over at most `n_buckets` keys with map-side
    combine: the shuffle carries ≤ n_buckets rows per task no matter the
    corpus size, and the collected table is ≤ n_buckets rows (fixed, e.g.
    4096) — the same bounded-driver-state contract as IVF centroid training
    (similarity.py:ivf_train_centroids);
  * per-document scoring is a broadcast join of the ≤n_buckets ratio table
    onto the token stream followed by groupBy(doc) sum — map-side partial
    aggregation absorbs token skew, and the only full shuffle is on unique
    doc ids;
  * top-k compiles to TakeOrderedAndProject (bounded per-partition heaps).

Cross-engine determinism (the driver value-hashes results exactly):
  * the bucket hash is an md5 hex prefix (same trick as curation.hash_split):
    `conv(substring(md5(token),1,8),16,10) % B` in Spark equals
    `CAST('0x' || substring(md5(token),1,8) AS BIGINT) % B` in DuckDB
    bit-for-bit for every UTF-8 token;
  * log ratios are QUANTIZED to int64 micro-nats by one shared numpy kernel
    (`log_ratio_micronats`) applied to exact integer bucket counts, so the
    per-document weight is a pure int64 sum — associative and
    order-independent, hence identical under any partitioning and in any
    engine. The float `weight_nats` column is a single division of that
    integer by 1e6 — one IEEE op on identical inputs.
    The Spark path quantizes counts aggregated BY SPARK; the oracle twin
    quantizes counts aggregated BY DuckDB — a wrong distributed count
    therefore shows up as a hash mismatch, not a silent agreement.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from data_quality_check_spark.operators.vocab import TOKEN_RE

MICRO = 1_000_000


def bucket_col(token: Column, n_buckets: int) -> Column:
    """md5-prefix feature-hash bucket in [0, n_buckets) — JVM-side, exact
    DuckDB twin (`bucket_sql`)."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def bucket_sql(token_expr: str, n_buckets: int) -> str:
    """DuckDB expression computing the identical bucket id."""
    return (
        f"CAST(('0x' || substring(md5({token_expr}), 1, 8)) AS BIGINT) "
        f"% {n_buckets}"
    )


def log_ratio_micronats(
    target_counts: np.ndarray, raw_counts: np.ndarray
) -> np.ndarray:
    """Per-bucket quantized log importance ratio, int64 micro-nats.

    p_b = (t_b + 1) / (T + B)   (add-one smoothing over B buckets)
    q_b = (r_b + 1) / (R + B)
    r_b = round(1e6 * ln(p_b / q_b))

    One numpy kernel shared by the Spark path and the DuckDB oracle twin:
    both engines feed it exact integer counts, so any ulp wobble in `ln`
    cancels — the kernel is the single source of float truth, and its output
    is integer. np.rint ties-to-even is irrelevant at 1e-6 resolution on
    log ratios of rationals, and identical on both sides regardless.
    """
    t = np.asarray(target_counts, dtype=np.float64)
    r = np.asarray(raw_counts, dtype=np.float64)
    b = float(len(t))
    assert len(t) == len(r)
    lp = np.log(t + 1.0) - np.log(t.sum() + b)
    lq = np.log(r + 1.0) - np.log(r.sum() + b)
    return np.rint((lp - lq) * MICRO).astype(np.int64)


def hashed_token_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) per token occurrence — one JVM projection, no shuffle.

    Tokenization matches vocab.top_tokens (`[a-z0-9]+` over lowercased text)
    so the DuckDB `regexp_extract_all` twin splits byte-identically; null
    text yields zero tokens in both engines.

    `id_col` is any per-row label carried alongside the token stream — the
    scoring path passes the document id, the model-fit path passes the
    boolean target flag. Both paths MUST share this projection: it is the
    single definition of the tokenize+bucket pipeline, so a TOKEN_RE or
    bucket-hash change cannot skew the fitted model against the scorer.
    """
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("_token"),
    ).select("_id", bucket_col(F.col("_token"), n_buckets).alias("_bucket"))


def fit_bucket_ratios(
    df: DataFrame,
    target_pred: Column,
    id_col: str,
    text_col: str,
    n_buckets: int,
) -> np.ndarray:
    """Fit the hashed-unigram target/raw models and return the quantized
    ratio vector (length n_buckets, int64 micro-nats).

    ONE pass over the exploded token stream: conditional sums split the
    stream into target/raw counts per bucket; partial aggregation keeps the
    shuffle at ≤ n_buckets rows per task. Collects ≤ n_buckets rows — the
    bounded-driver-state exception the repo's anti-pattern budget allows
    (cf. IVF centroid training).
    """
    flagged = df.select(target_pred.alias("_tgt"), F.col(text_col))
    # the shared tokenize+bucket projection, keyed by the target flag
    # (hashed_token_buckets returns it as "_id")
    toks = hashed_token_buckets(flagged, "_tgt", text_col, n_buckets)
    rows = (
        toks.groupBy("_bucket")
        .agg(
            F.sum(F.when(F.col("_id"), 1).otherwise(0)).alias("t"),
            F.sum(F.when(~F.col("_id"), 1).otherwise(0)).alias("r"),
        )
        .collect()
    )
    t = np.zeros(n_buckets, dtype=np.int64)
    r = np.zeros(n_buckets, dtype=np.int64)
    for row in rows:
        t[row["_bucket"]] = row["t"]
        r[row["_bucket"]] = row["r"]
    return log_ratio_micronats(t, r)


def dsir_topk(
    spark: SparkSession,
    df: DataFrame,
    target_pred: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Top-k raw-pool documents by DSIR importance weight.

    Output: (doc_id, weight_micronats BIGINT, weight_nats DOUBLE), ordered
    weight desc then id asc (deterministic k-boundary). Raw documents with
    zero tokens keep weight 0 (left join), so the ranked universe is exactly
    the raw pool, not "raw docs that happened to tokenize".

    The paper's Gumbel-noise resampling variant is a one-line extension
    (add per-doc Gumbel(0,1) keyed on a seeded hash before the top-k); the
    registered query keeps the deterministic argmax form so the driver can
    value-hash it.
    """
    ratios = fit_bucket_ratios(df, target_pred, id_col, text_col, n_buckets)
    raw = df.filter(~target_pred)
    return (
        dsir_scores(spark, raw, ratios, id_col=id_col, text_col=text_col)
        .orderBy(F.col("weight_micronats").desc(), F.col(id_col).asc())
        .limit(k)
    )


def dsir_scores(
    spark: SparkSession,
    df: DataFrame,
    ratios: np.ndarray,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a FROZEN ratio vector — the recurring-run shape
    (same contract as drift.categorical_drift_vs_counts and the seen-corpus
    artifacts): fit once with `fit_bucket_ratios`, persist the n_buckets
    int64 values wherever configs live, and score each day's increment
    without touching the reference corpus again. O(increment) per run; the
    model is a ≤4 KB array for the default 1024 buckets.

    Output: ({id_col}, weight_micronats, weight_nats) for EVERY input row
    (token-less docs weigh 0), unranked — callers keep their own top-k or
    threshold. `dsir_topk(...)` is exactly fit + this + rank."""
    n_buckets = len(ratios)
    ratio_df = spark.createDataFrame(
        [(int(b), int(v)) for b, v in enumerate(np.asarray(ratios))],
        schema="_bucket BIGINT, _r BIGINT",
    )
    tok_w = (
        hashed_token_buckets(df, id_col, text_col, n_buckets)
        .join(F.broadcast(ratio_df), "_bucket")
        .groupBy("_id")
        .agg(F.sum("_r").alias("_w"))
    )
    return (
        df.select(F.col(id_col))
        .join(tok_w, F.col(id_col) == F.col("_id"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_w"), F.lit(0)).alias("weight_micronats"),
            (F.coalesce(F.col("_w"), F.lit(0)) / F.lit(float(MICRO))).alias(
                "weight_nats"
            ),
        )
    )
