"""Corpus vocabulary heavy hitters (operators/vocab.py)."""

from pyspark.sql import functions as F

from data_quality_check_spark.operators.vocab import top_tokens


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "The DOG! the dog, ran."),
            (3, "cat&dog café 42 x"),
        ],
        "doc_id long, text string",
    )


def test_top_tokens_counts_tf_and_df(spark):
    got = {r.token: (r.n_occurrences, r.n_docs) for r in top_tokens(_docs(spark), "doc_id", "text").collect()}
    assert got["the"] == (4, 2)  # case-folded, punctuation split
    assert got["dog"] == (3, 2)  # '&' and '!' both separate
    assert got["cat"] == (2, 2)
    assert got["42"] == (1, 1)  # digits tokenize
    assert "caf" in got  # non-ASCII 'é' is a separator in the shared alphabet


def test_top_tokens_min_len_and_k_with_deterministic_ties(spark):
    rows = top_tokens(_docs(spark), "doc_id", "text", k=4, min_len=2).collect()
    assert [r.token for r in rows][:2] == ["the", "dog"]
    assert all(len(r.token) >= 2 for r in rows)
    # count-tied tokens at the k boundary resolve by token asc
    counts = [(r.n_occurrences, r.token) for r in rows]
    assert counts == sorted(counts, key=lambda t: (-t[0], t[1]))


def test_top_tokens_plan_is_bounded_topk_no_python(spark):
    plan = (
        top_tokens(_docs(spark), "doc_id", "text", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a global sort
    assert "Python" not in plan
