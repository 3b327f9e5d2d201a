"""Corpus vocabulary heavy hitters (operators/vocab.py)."""

from pyspark.sql import functions as F

from data_quality_check_spark.operators import vocab as VB
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

# ───────────────────────── mergeable heavy hitters ─────────────────────────


def _corpus(spark, n_docs=400, seed=3):
    """Zipf-ish synthetic corpus: a head vocabulary everyone shares plus a
    long per-doc tail, bucketed by doc id — enough skew that truncation at
    small m actually drops tokens."""
    import numpy as np

    rng = np.random.RandomState(seed)
    head = [f"hot{i}" for i in range(12)]
    rows = []
    for d in range(n_docs):
        toks = []
        for i, h in enumerate(head):
            toks += [h] * int(rng.poisson(12 - i) + (1 if i < 4 else 0))
        toks += [f"tail{d}x{j}" for j in range(rng.randint(3, 9))]
        rng.shuffle(toks)
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.withColumn(
        "_b", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(8)).cast("int")
    )


def test_vocab_partials_merge_equals_exact_topk(spark):
    """VERDICT r3 task 7: merged heavy-hitter summaries reproduce the exact
    rescan top-k — values AND set — at the safety margin, with the guarantee
    CERTIFIED by the cap arithmetic, not assumed."""
    from data_quality_check_spark.operators.vocab import (
        merge_vocab_partials,
        top_tokens,
        vocab_partial,
        vocab_topk_certified,
    )

    df = _corpus(spark)
    parts = vocab_partial(df, "_b", "doc_id", "text", m=64).persist()
    try:
        exact = top_tokens(df, "doc_id", "text", k=10).collect()
        merged = merge_vocab_partials(parts, k=10).collect()
        assert [(r.token, r.n_occurrences, r.n_docs) for r in merged] == [
            (r.token, r.n_occurrences, r.n_docs) for r in exact
        ]
        assert all(r.certified for r in merged)
        assert vocab_topk_certified(parts, k=10)
        # truncation really bit (this is a summary, not the full token table)
        n_items = parts.select(F.explode("items")).count()
        n_tokens = df.select(
            F.explode(F.split(F.col("text"), " "))
        ).distinct().count()
        assert n_items < n_tokens
    finally:
        parts.unpersist()


def test_vocab_partials_batch_merge_invariance(spark):
    """Summaries from two disjoint ingest batches merge to the same certified
    top-k as one whole-corpus pass — the no-rescan maintenance property."""
    from data_quality_check_spark.operators.vocab import (
        merge_vocab_partials,
        vocab_partial,
    )

    df = _corpus(spark)
    whole = vocab_partial(df, "_b", "doc_id", "text", m=64)
    b1 = vocab_partial(df.filter("doc_id < 200"), "_b", "doc_id", "text", m=64)
    b2 = vocab_partial(df.filter("doc_id >= 200"), "_b", "doc_id", "text", m=64)
    a = merge_vocab_partials(whole, k=10).collect()
    b = merge_vocab_partials(b1.unionByName(b2), k=10).collect()
    assert [(r.token, r.n_occurrences, r.n_docs) for r in a] == [
        (r.token, r.n_occurrences, r.n_docs) for r in b
    ]


def test_vocab_compact_preserves_merge_and_bounds(spark):
    """Compaction folds batches×buckets rows to one per bucket: retained
    counts unchanged, upper bounds still valid (conservative), same top-k."""
    from data_quality_check_spark.operators.vocab import (
        compact_vocab_partials,
        merge_vocab_partials,
        vocab_partial,
    )

    df = _corpus(spark)
    b1 = vocab_partial(df.filter("doc_id < 200"), "_b", "doc_id", "text", m=64)
    b2 = vocab_partial(df.filter("doc_id >= 200"), "_b", "doc_id", "text", m=64)
    parts = b1.unionByName(b2)
    comp = compact_vocab_partials(parts, m=64)
    assert comp.count() == 8  # one row per bucket again
    assert sorted(comp.columns) == sorted(parts.columns)
    a = merge_vocab_partials(parts, k=10).collect()
    b = merge_vocab_partials(comp, k=10).collect()
    assert [(r.token, r.n_occurrences, r.n_docs) for r in a] == [
        (r.token, r.n_occurrences, r.n_docs) for r in b
    ]
    # compacted bounds are conservative: ub_compacted >= ub_raw per token
    ub_a = {r.token: r.n_occurrences_ub for r in a}
    assert all(r.n_occurrences_ub >= ub_a[r.token] for r in b)


def test_vocab_uncertified_when_m_too_small(spark):
    """With m below the safety margin the certificate must REFUSE (caps make
    the truncation honest) rather than silently return a wrong top-k."""
    from data_quality_check_spark.operators.vocab import (
        merge_vocab_partials,
        vocab_partial,
        vocab_topk_certified,
    )

    df = _corpus(spark)
    parts = vocab_partial(df, "_b", "doc_id", "text", m=2)
    assert not vocab_topk_certified(parts, k=10)
    got = merge_vocab_partials(parts, k=10).collect()
    assert any(not r.certified for r in got) or len(got) < 10


def test_vocab_merge_query_certifies_on_gate_fixture(spark):
    """The registered vocab_merge_top_tokens_documents query's safety margin
    (m=2048) must CERTIFY on the sf0.01 gate table — the oracle equality in
    the driver gate is then guaranteed by arithmetic, not fixture luck."""
    import os

    from data_quality_check_spark.operators.vocab import (
        vocab_partial,
        vocab_topk_certified,
    )

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).withColumn(
        "_b", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(16)).cast("int")
    )
    parts = vocab_partial(docs, "_b", "doc_id", "text", m=2048, min_len=2)
    assert vocab_topk_certified(parts, k=25)


def test_vocab_compaction_cannot_fake_certainty(spark):
    """A token truncated out of one batch's summary but retained in another's
    must NOT come out of compaction with a 'provably exact' count: its err
    slack carries the truncating batch's cap, the merge ub covers the true
    count, and certified is False. (Regression: compaction used to erase the
    absent-row attribution, so the merge subtracted the full row cap for
    'present' tokens and under-reported the upper bound.)"""
    from data_quality_check_spark.operators.vocab import (
        compact_vocab_partials,
        merge_vocab_partials,
        vocab_partial,
        vocab_topk_certified,
    )

    # batch 1: 'victim' occurs 5x but m=2 truncates it (hot1/hot2 dominate);
    # batch 2: 'victim' is hot and retained. One bucket throughout.
    b1 = spark.createDataFrame(
        [(1, "hot1 " * 9 + "hot2 " * 8 + "victim " * 5)], "doc_id long, text string"
    ).withColumn("_b", F.lit(0))
    b2 = spark.createDataFrame(
        [(2, "victim " * 7 + "hot1 " * 2)], "doc_id long, text string"
    ).withColumn("_b", F.lit(0))
    p1 = vocab_partial(b1, "_b", "doc_id", "text", m=2)
    p2 = vocab_partial(b2, "_b", "doc_id", "text", m=2)
    comp = compact_vocab_partials(p1.unionByName(p2), m=8)

    got = {r.token: r for r in merge_vocab_partials(comp, k=8).collect()}
    v = got["victim"]
    true_count = 12  # 5 (truncated in batch 1) + 7 (retained in batch 2)
    assert v.n_occurrences <= true_count <= v.n_occurrences_ub
    assert not v.certified  # the lost batch-1 attribution is visible slack
    # and the raw (uncompacted) merge tells the same honest story
    raw = {r.token: r for r in merge_vocab_partials(p1.unionByName(p2), k=8).collect()}
    assert raw["victim"].n_occurrences_ub >= true_count
    assert not vocab_topk_certified(comp, k=3)


def test_vocab_certificate_refuses_boundary_ties(spark):
    """If an excluded token's upper bound TIES the k-th retained count, the
    top-k SET depends on the (count desc, token asc) tie-break over a token
    the summaries may not retain — the certificate must refuse. (Regression:
    the comparison was >=.)"""
    from data_quality_check_spark.operators.vocab import (
        vocab_partial,
        vocab_topk_certified,
    )

    # 'apple' and 'zebra' tie at 4 occurrences; m=1 retains only one per
    # bucket-batch summary, so the other is truncation slack with cap 4 —
    # hidden_bound == kth == 4 exactly.
    df = spark.createDataFrame(
        [(1, "apple " * 4 + "zebra " * 4)], "doc_id long, text string"
    ).withColumn("_b", F.lit(0))
    parts = vocab_partial(df, "_b", "doc_id", "text", m=1)
    assert not vocab_topk_certified(parts, k=1)


def test_top_bigrams_adjacency_and_filter_before_pair(spark):
    """Bigrams pair adjacent tokens of the FILTERED sequence (min_len drops
    rejoin neighbours); counts and doc frequencies are exact."""
    from data_quality_check_spark.operators.vocab import top_bigrams

    df = spark.createDataFrame(
        [
            (1, "click here to win, click here to play"),
            (2, "Click HERE now"),
            (3, "a b a b"),   # single-char tokens: gone at min_len=2
            (4, None),
            (5, "one"),       # one token -> no bigram
        ],
        "doc_id long, text string",
    )
    rows = top_bigrams(df, "doc_id", "text", k=10, min_len=2).collect()
    got = {r.bigram: (r.n_occurrences, r.n_docs) for r in rows}
    assert got["click here"] == (3, 2)
    assert got["here to"] == (2, 1)
    # min_len filtering happens BEFORE pairing: "a b a b" yields nothing,
    # and doc 2's "HERE now" lowercases + pairs across the filtered stream
    assert "a b" not in got
    assert got["here now"] == (1, 1)
    # ties break bigram-asc at the k boundary
    ordered = [(r.n_occurrences, r.bigram) for r in rows]
    assert ordered == sorted(ordered, key=lambda x: (-x[0], x[1]))


def test_top_bigrams_plan_is_bounded_topk_no_python(spark):
    from data_quality_check_spark.operators.vocab import top_bigrams

    plan = (
        top_bigrams(_docs(spark), "doc_id", "text", k=5, min_len=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a global sort
    assert "Python" not in plan  # pairing is one JVM projection


def test_token_fertility_hand_computed(spark):
    """Multibyte chars count once but several bytes; null text is zero-volume;
    NULL lang is a group; a language with zero tokens reports NULL ratios."""
    rows = [
        (1, "ab cd", "en"),        # 2 tokens, 5 chars, 5 bytes
        (2, "xyz", "en"),          # 1 token, 3 chars, 3 bytes
        (3, "héé", "fr"),          # 1 token ('h'; é not in [a-z0-9]), 3 chars, 5 bytes
        (4, None, "fr"),           # zero volume
        (5, "!!!", "zz"),          # 0 tokens → NULL ratios
        (6, "ok", None),           # NULL lang group
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in VB.token_fertility(df).collect()}
    assert set(out) == {"en", "fr", "zz", None}

    en = out["en"]
    assert (en["n_docs"], en["n_tokens"], en["n_chars"], en["n_bytes"]) == (2, 3, 8, 8)
    assert en["chars_per_token"] == round(8 / 3, 6)
    assert en["tokens_per_doc"] == 1.5

    fr = out["fr"]
    assert (fr["n_docs"], fr["n_tokens"], fr["n_chars"], fr["n_bytes"]) == (2, 1, 3, 5)
    assert fr["bytes_per_token"] == 5.0

    zz = out["zz"]
    assert zz["n_tokens"] == 0
    assert zz["chars_per_token"] is None and zz["bytes_per_token"] is None

    assert out[None]["n_tokens"] == 1


def test_token_fertility_plan_never_explodes(spark):
    """The token stream must never materialize: size() over the extracted
    array in one projection, then a ≤|langs|-key agg — no Generate/explode
    node, no Python, no join."""
    df = spark.createDataFrame([(1, "a b", "en")], "doc_id long, text string, lang string")
    plan = (
        VB.token_fertility(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan, plan  # explode would show as Generate
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dominant_script_and_expectation(spark):
    """Per-block counting: dominant script by code-point majority, 'none' on
    letterless text, ties to class order; lang→script expectation map is
    case-insensitive and NULL for unknown langs."""
    from data_quality_check_spark.functions import text as TX

    rows = [
        (1, "hello world", "EN"),
        (2, "数据质量检查", "zh"),
        (3, "данные и ещё данные", "ru"),
        (4, "hello 数据质量检查流水线", "zh"),   # cjk majority (9 > 5)
        (5, "1234 !!!", "en"),                  # none
        (6, None, None),                        # none, no expectation
        (7, "مرحبا بالعالم", "ar"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    out = {
        r["id"]: (r["dom"], r["exp"])
        for r in df.select(
            "id",
            TX.dominant_script_col(F.col("text")).alias("dom"),
            TX.expected_script_col(F.col("lang")).alias("exp"),
        ).collect()
    }
    assert out[1] == ("latin", "latin")
    assert out[2] == ("cjk", "cjk")
    assert out[3] == ("cyrillic", "cyrillic")
    assert out[4] == ("cjk", "cjk")
    assert out[5] == ("none", "latin")
    assert out[6] == ("none", None)
    assert out[7] == ("arabic", "arabic")


def test_script_classes_kana_and_symbol_edges(spark):
    """Review fixes: kana-heavy Japanese counts as cjk (the ja expectation is
    satisfiable); ×/÷ are NOT Latin letters, so symbol-only text stays
    'none' and can never raise a mismatch."""
    from data_quality_check_spark.functions import text as TX

    rows = [(1, "これはテストです", "ja"), (2, "3 × 4 ÷ 2", "zh"), (3, "××÷", "ru")]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    out = {
        r["id"]: (r["dom"], r["exp"])
        for r in df.select(
            "id",
            TX.dominant_script_col(F.col("text")).alias("dom"),
            TX.expected_script_col(F.col("lang")).alias("exp"),
        ).collect()
    }
    assert out[1] == ("cjk", "cjk")
    assert out[2][0] == "none" and out[3][0] == "none"
