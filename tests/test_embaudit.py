"""Embedding health audit: malformed-vector taxonomy, norm moments,
variance-collapse flag, and the no-key-shuffle / partial-agg plan shapes."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from data_quality_check_spark.operators.embaudit import (
    dimension_stats,
    embedding_health,
)

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], _SCHEMA
    )


def test_health_taxonomy_is_disjoint_and_complete(spark):
    nan, inf = float("nan"), float("inf")
    vecs = [
        [3.0, 4.0],          # healthy, norm 5
        [0.0, 0.0],          # zero-norm
        None,                # null
        [1.0],               # wrong dim
        [1.0, 2.0, 3.0],     # wrong dim (too long)
        [nan, 1.0],          # non-finite
        [1.0, -inf],         # non-finite
        [0.0, 1.0],          # healthy, norm 1
    ]
    [r] = embedding_health(_df(spark, vecs), "embedding", dim=2).collect()
    assert r.n_vectors == 8
    assert (r.n_null, r.n_wrong_dim, r.n_nonfinite) == (1, 2, 2)
    assert (r.n_zero_norm, r.n_ok) == (1, 2)
    # partition of the corpus: categories sum to the total
    assert r.n_null + r.n_wrong_dim + r.n_nonfinite + r.n_zero_norm + r.n_ok == 8
    # norm moments cover the 3 healthy vectors (zero-norm included): 5, 0, 1
    assert r.norm_mean == 2.0 and r.norm_min == 0.0 and r.norm_max == 5.0
    # population std of [5, 0, 1]
    assert r.norm_std == round(math.sqrt(((5 - 2) ** 2 + 4 + 1) / 3), 4)


def test_health_all_null_corpus_has_null_moments(spark):
    [r] = embedding_health(_df(spark, [None, None]), "embedding", dim=2).collect()
    assert (r.n_vectors, r.n_null, r.n_ok) == (2, 2, 0)
    assert r.norm_mean is None and r.norm_max is None


def test_dimension_stats_exclude_unhealthy_and_flag_collapse(spark):
    vecs = [
        [1.0, 7.0],
        [3.0, 7.0],
        [float("nan"), 100.0],  # must not poison either dimension
        None,
        [5.0, 7.0],
    ]
    got = {r.dim: r for r in dimension_stats(_df(spark, vecs), "embedding", dim=2).collect()}
    assert set(got) == {0, 1}
    assert (got[0].mean, got[0].vmin, got[0].vmax) == (3.0, 1.0, 5.0)
    assert got[0].std == round(math.sqrt(8 / 3), 4)
    assert not got[0].collapsed
    # dimension 1 is constant across healthy vectors → collapsed
    assert (got[1].mean, got[1].std, got[1].collapsed) == (7.0, 0.0, True)


def test_health_plan_no_key_shuffle_no_python(spark):
    df = _df(spark, [[1.0, 2.0]] * 4)
    plan = (
        embedding_health(df, "embedding", dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "Python" not in plan
    assert "Generate" not in plan  # norm is F.aggregate — never an explode


def test_dimension_stats_plan_partial_agg_before_exchange(spark):
    df = _df(spark, [[1.0, 2.0]] * 4)
    plan = (
        dimension_stats(df, "embedding", dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "Generate" in plan  # codegen'd posexplode
    # partial hash agg runs below the dim-key exchange: the shuffle moves
    # <= D rows per task, not N x D exploded rows
    exch = plan.index("hashpartitioning")
    assert "partial" in plan[exch:].lower()


@pytest.mark.parametrize("bad", [[[float("inf"), 1.0]], [[1.0, float("nan")]]])
def test_nonfinite_never_reaches_moments(spark, bad):
    vecs = bad + [[3.0, 4.0]]
    [r] = embedding_health(_df(spark, vecs), "embedding", dim=2).collect()
    assert r.n_nonfinite == 1 and r.n_ok == 1
    assert r.norm_mean == 5.0  # only the healthy vector's norm

    rows = dimension_stats(_df(spark, vecs), "embedding", dim=2).collect()
    for row in rows:
        assert math.isfinite(row.mean) and math.isfinite(row.std)


def test_fixture_embeddings_are_healthy(spark, sf_dir):
    [r] = embedding_health(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "embedding", dim=64
    ).collect()
    assert r.n_vectors == r.n_ok  # driver fixtures contain no malformed vectors
    assert r.norm_min > 0
    got = dimension_stats(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "embedding", dim=64
    ).collect()
    assert len(got) == 64 and not any(row.collapsed for row in got)
