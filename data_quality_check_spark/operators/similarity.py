"""Similarity search over embedding columns (`array<float>`).

  * brute-force cosine top-k — the exact baseline: broadcast the (small) query
    set, fold dot products with JVM array lambdas, rank per query
  * label-blocked near-duplicate pairs — exact threshold join inside blocks
  * sign-random-projection LSH buckets — the scale path: candidates only join
    within a bucket; recall/bucket-size tradeoff measured against brute force in
    tests

All arithmetic is promoted to double before accumulation so results are engine-
stable; exposed values are rounded (4 dp) for hash-safe oracle comparison.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine_col(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force; broadcast the
    query side — the candidate side streams, no shuffle until the final top-k)."""
    joined = df.crossJoin(F.broadcast(queries)).filter(F.col(id_col) != F.col(qid_col))
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), F.col(qvec_col)), 4).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def neardup_pairs_blocked(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Exact cosine-threshold pairs within blocking-key groups (id_a < id_b)."""
    a = df.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = df.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def srp_bucket_col(vec_col: str, n_bits: int = 16, dim: int = 64, seed: int = 11) -> F.Column:
    """Sign-random-projection bucket id (n_bits planes) as a JVM expression:
    bit_j = dot(vec, plane_j) > 0. Planes are a seeded numpy matrix baked into the
    plan as literals (model-free LSH)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_bits, dim))
    bucket = F.lit(0).cast("long")
    for j in range(n_bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        dot = _dot(F.col(vec_col), plane)
        bucket = bucket + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: candidates share the query's SRP bucket, exact rerank
    inside. At 10^12 scale the bucket join replaces the crossJoin — candidates
    drop by ~2^n_bits while recall stays high for near-duplicate queries."""
    cand = df.withColumn("bucket", srp_bucket_col(vec_col, n_bits, dim))
    q = queries.withColumn("bucket", srp_bucket_col(qvec_col, n_bits, dim))
    joined = cand.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col(qid_col))
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), F.col(qvec_col)), 4).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
