"""DSIR importance resampling (operators/dsir.py): semantic sanity on planted
distributions, kernel invariants, partitioning invariance, and the plan
properties the 100 TB design depends on (JVM-only token stream, broadcast
ratio join). The cross-engine value-hash is covered by the oracle gate
(tests/test_entry_oracle.py::dsir_topk_documents)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_quality_check_spark.operators import dsir


def _corpus(spark):
    """Target docs speak vocab-A ('alpha beta gamma'); raw pool is half
    A-speakers, half B-speakers ('zork quux blee'). DSIR must rank every
    A-speaking raw doc above every B-speaking one."""
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta gamma alpha beta", "target"))
    for i in range(20, 40):
        rows.append((i, "alpha beta gamma beta alpha gamma", "raw"))
    for i in range(40, 60):
        rows.append((i, "zork quux blee zork quux blee", "raw"))
    rows.append((60, None, "raw"))  # null text → weight 0, still ranked
    return spark.createDataFrame(rows, "doc_id long, text string, pool string")


def test_planted_target_vocabulary_ranks_first(spark):
    df = _corpus(spark)
    out = dsir.dsir_topk(
        spark, df, F.col("pool") == "target", k=41, n_buckets=256
    ).toPandas()
    assert len(out) == 41  # the whole raw pool, null-text doc included
    a_ids = set(range(20, 40))
    top20 = set(out.head(20)["doc_id"])
    assert top20 == a_ids
    a_w = out[out["doc_id"].isin(a_ids)]["weight_micronats"]
    b_w = out[~out["doc_id"].isin(a_ids | {60})]["weight_micronats"]
    assert a_w.min() > 0 > b_w.max()  # log-ratio sign separates the pools
    null_row = out[out["doc_id"] == 60]
    assert null_row["weight_micronats"].iloc[0] == 0


def test_kernel_identical_counts_give_zero_ratio():
    c = np.array([5, 0, 17, 1], dtype=np.int64)
    assert (dsir.log_ratio_micronats(c, c) == 0).all()


def test_kernel_monotone_in_target_mass():
    t = np.array([10, 1, 1, 1], dtype=np.int64)
    r = np.array([1, 10, 1, 1], dtype=np.int64)
    out = dsir.log_ratio_micronats(t, r)
    assert out[0] > 0 > out[1]
    assert out[2] == out[3]  # symmetric buckets get identical ratios


def test_weights_invariant_to_partitioning(spark):
    df = _corpus(spark)
    pred = F.col("pool") == "target"
    a = dsir.dsir_topk(spark, df, pred, k=41, n_buckets=64).toPandas()
    b = dsir.dsir_topk(
        spark, df.repartition(13, "doc_id"), pred, k=41, n_buckets=64
    ).toPandas()
    assert a.equals(b)  # int64 micro-nat sums are order-independent


def test_plan_is_jvm_only_with_broadcast_ratio_join(spark):
    df = _corpus(spark)
    out = dsir.dsir_topk(spark, df, F.col("pool") == "target", k=10, n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_kernel_antisymmetry_property():
    """Swapping target and raw must exactly negate every quantized ratio —
    the kernel computes lp−lq from the same two log vectors, so antisymmetry
    is exact even at int64 quantization (np.rint(−x) = −np.rint(x) away from
    .5 ties, and ties land on even multiples identically)."""
    import numpy as np

    rng = np.random.RandomState(7)
    for _ in range(25):
        n = rng.randint(2, 64)
        t = rng.randint(0, 1000, size=n).astype(np.int64)
        r = rng.randint(0, 1000, size=n).astype(np.int64)
        a = dsir.log_ratio_micronats(t, r)
        b = dsir.log_ratio_micronats(r, t)
        assert (a == -b).all()


def test_frozen_ratio_scoring_equals_fit_and_score(spark):
    """The recurring-run shape: fit once, persist the int64 vector, score the
    increment under the FROZEN ratios — must reproduce dsir_topk exactly on
    the same corpus (the artifact changes the JOB SHAPE, never the answer),
    and score a never-fitted increment without refitting."""
    df = _corpus(spark)
    pred = F.col("pool") == "target"
    ratios = dsir.fit_bucket_ratios(df, pred, "doc_id", "text", 64)
    frozen = (
        dsir.dsir_scores(spark, df.filter(~pred), ratios)
        .orderBy(F.col("weight_micronats").desc(), F.col("doc_id").asc())
        .limit(41)
        .toPandas()
    )
    fitted = dsir.dsir_topk(spark, df, pred, k=41, n_buckets=64).toPandas()
    assert frozen.equals(fitted)

    inc = spark.createDataFrame(
        [(1000, "alpha beta gamma"), (1001, "zork quux"), (1002, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dsir.dsir_scores(spark, inc, ratios).collect()}
    assert len(out) == 3
    assert out[1000]["weight_micronats"] > 0 > out[1001]["weight_micronats"]
    assert out[1002]["weight_micronats"] == 0
