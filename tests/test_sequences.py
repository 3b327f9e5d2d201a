"""Concat-and-chunk sequence construction (operators/sequences.py): stream
invariants, boundary-straddling docs, partitioning/bucketing invariance, and
the scale-shape plan. Cross-engine value parity is the oracle gate
(pack_sequences_documents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_check_spark.operators import sequences as SQ


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_stream_invariants(spark):
    """Total tokens conserved (Σ doc tokens + one EOS each); seq_ids are
    contiguous from 0; every window but the last is exactly seq_len; within-
    window order follows the global (qkey, id) concat order."""
    texts = [f"alpha beta w{i} gamma" for i in range(30)] + [None, ""]
    df = _df(spark, texts)
    L = 16
    out = sorted(
        SQ.pack_sequences(df, "doc_id", "text", seq_len=L, n_buckets=8).collect(),
        key=lambda r: r.seq_id,
    )
    n_tok_expected = 30 * 5 + 2  # 4 words + EOS per doc, 1 EOS per empty doc
    assert sum(r.n_tokens for r in out) == n_tok_expected
    assert [r.seq_id for r in out] == list(range(len(out)))
    for r in out[:-1]:
        assert r.n_tokens == L and r.complete
    tail = n_tok_expected % L or L
    assert out[-1].n_tokens == tail
    assert out[-1].complete == (tail == L)

    # flattening the windows reproduces the reference concat exactly
    got = [t for r in out for t in r.input_ids]
    ref = _reference_stream(texts)
    assert got == ref


def _reference_stream(texts, vocab=SQ.VOCAB_SIZE):
    """Independent driver-side recomputation: LCG order + md5 bucket ids."""
    import hashlib
    import re

    def key(i):
        return (i % 2_147_483_648 * 1103515245 + 12345) % 2_147_483_648

    stream = []
    for i in sorted(range(len(texts)), key=lambda i: (key(i), i)):
        t = texts[i] or ""
        for tok in re.findall("[a-z0-9]+", t.lower()):
            stream.append(int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % vocab)
        stream.append(vocab)
    return stream


def test_long_doc_straddles_many_windows(spark):
    """A single document longer than several windows splits exactly, with the
    window count and n_docs bookkeeping correct."""
    long_text = " ".join(f"t{i}" for i in range(100))  # 100 tokens + EOS
    df = _df(spark, [long_text])
    out = sorted(
        SQ.pack_sequences(df, "doc_id", "text", seq_len=16, n_buckets=4).collect(),
        key=lambda r: r.seq_id,
    )
    assert len(out) == 7  # ceil(101/16)
    assert all(r.n_docs == 1 for r in out)
    assert [t for r in out for t in r.input_ids] == _reference_stream([long_text])


@pytest.mark.parametrize("n_buckets", [1, 4, 64])
def test_invariant_to_bucket_count_and_partitioning(spark, n_buckets):
    """The two-phase prefix sum must produce identical sequences for ANY
    bucket count and input partitioning — the decomposition changes the
    plan, never the offsets."""
    texts = [f"w{i} x{i} y{i}" for i in range(25)]
    df = _df(spark, texts)
    a = sorted(
        SQ.pack_sequences(df, "doc_id", "text", 16, n_buckets=n_buckets).collect(),
        key=lambda r: r.seq_id,
    )
    b = sorted(
        SQ.pack_sequences(
            df.repartition(7), "doc_id", "text", 16, n_buckets=8
        ).collect(),
        key=lambda r: r.seq_id,
    )
    assert [(r.seq_id, list(r.input_ids), r.n_docs) for r in a] == [
        (r.seq_id, list(r.input_ids), r.n_docs) for r in b
    ]


def test_plan_has_no_global_sort(spark):
    """Scale shape: the prefix sum must run per range-bucket — no
    single-partition global Sort/Window (an Exchange SinglePartition feeding
    a Window would serialize the corpus)."""
    df = _df(spark, [f"a{i} b{i}" for i in range(50)])
    plan = (
        SQ.pack_sequences(df, "doc_id", "text", 16, n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_negative_and_null_ids(spark):
    """Negative 64-bit ids (negative LCG keys — review fix: they used to
    vanish through the unmapped-bucket path) pack exactly like the DuckDB
    twin; NULL-id rows are excluded in BOTH engines by contract."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([-9_000_000_001, -3, 0, 7, None], dtype="Int64"),
            "text": ["neg one two", "neg2 a", "zero b c", "pos d", "dropped e"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = sorted(
        SQ.pack_sequences(df, "doc_id", "text", seq_len=8, n_buckets=4).collect(),
        key=lambda r: r.seq_id,
    )
    # 4 non-null docs: 3+2+3+2 tokens + 4 EOS = 14 tokens — none dropped
    assert sum(r.n_tokens for r in out) == 14

    con = duckdb.connect()
    con.register("docs", pdf)
    duck = (
        con.execute(SQ.pack_sequences_sql("docs", "doc_id", "text", seq_len=8))
        .df()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    assert [list(r.input_ids) for r in out] == [list(x) for x in duck["input_ids"]]


def test_non_power_of_two_buckets_rejected(spark):
    df = _df(spark, ["a b"])
    with pytest.raises(ValueError, match="power of two"):
        SQ.pack_sequences(df, "doc_id", "text", 8, n_buckets=48)
