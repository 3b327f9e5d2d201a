"""Concat-and-chunk training-sequence construction — the last-mile step that
turns a kept corpus into fixed-length token-id rows a dataloader consumes.

The published recipe (GPT-2/3, The Pile): concatenate every document in a
fixed order with an EOS separator, then cut the stream into length-L windows.
Documents therefore straddle window boundaries by design — no padding waste,
and the order is a seeded permutation so each window mixes sources.

Spark-first shape (no global sort, no driver stream):
  1. token ids are JVM expressions end to end — the BPE-ish word split
     (vocab.TOKEN_RE over lowercased text) hashed to a fixed vocab with the
     SAME md5-prefix bucket trick as dsir.bucket_col, so the DuckDB twin
     reproduces every id bit-for-bit; EOS = vocab_size (one id past the hash
     range);
  2. the global token offset of each document is an EXACT TWO-PHASE PREFIX
     SUM: documents range-bucket by their LCG order key (shifted by 2^31 so
     the bucket top-bits cover the FULL signed key domain — Java/DuckDB `%`
     keep the dividend's sign, so negative 64-bit ids yield negative keys),
     a per-bucket window computes local running totals in parallel, and the
     ≤n_buckets bucket totals are cumulated driver-side and broadcast back.
     Equivalent to one global ordered window, without ever sorting the
     corpus on a single partition. The bucket exchange carries each document
     once (id, key, length, text — the corpus-order pass any packer pays);
     the totals side-plan stays (bucket, length)-narrow and never hashes a
     token;
  3. each document explodes to the ≤⌈len/L⌉+1 sequences it overlaps
     (`sequence()` + `slice()` — pure JVM array ops on its own token array);
  4. one shuffle keyed by seq_id reassembles windows: sort_array over
     (start_in_seq, part) structs then flatten — the sort is within ONE
     window's ≤L tokens, never wider.

Determinism: every step is integer arithmetic on (id, token) — identical
under any partitioning and in the DuckDB twin (which uses a plain global
window; the two-phase decomposition changes the PLAN, never the offsets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from data_quality_check_spark.operators.curation import _LCG_M, _sample_key
from data_quality_check_spark.operators.dsir import bucket_col, bucket_sql
from data_quality_check_spark.operators.vocab import TOKEN_RE

VOCAB_SIZE = 32_768  # hashed-token id range; EOS = VOCAB_SIZE


def token_ids_col(text: Column, vocab_size: int = VOCAB_SIZE) -> Column:
    """Token-id array for a document: word tokens hashed into [0, vocab_size)
    with the cross-engine-exact md5-prefix bucket, EOS (= vocab_size)
    appended. Null/empty text is just [EOS] — the document still occupies
    one position in the stream, so offsets never collide."""
    toks = F.regexp_extract_all(F.lower(F.coalesce(text, F.lit(""))), F.lit(TOKEN_RE), 0)
    ids = F.transform(toks, lambda t: bucket_col(t, vocab_size).cast("int"))
    return F.concat(ids, F.array(F.lit(vocab_size).cast("int")))


def token_ids_sql(text_expr: str, vocab_size: int = VOCAB_SIZE) -> str:
    """DuckDB twin of token_ids_col (1-indexed list funcs, same hash)."""
    b = bucket_sql("t", vocab_size)
    return (
        f"list_append(list_transform(regexp_extract_all(lower(COALESCE({text_expr}, '')),"
        f" '{TOKEN_RE}'), t -> CAST({b} AS INT)), CAST({vocab_size} AS INT))"
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    vocab_size: int = VOCAB_SIZE,
    n_buckets: int = 64,
) -> DataFrame:
    """Fixed-length training sequences from a document corpus.

    Output: (seq_id BIGINT, input_ids array<int>, n_tokens int, n_docs int,
    complete boolean) — one row per length-`seq_len` window of the global
    EOS-separated token stream, in-window order exact; the final window may
    be short (complete = false) and padding is left to the consumer.
    `n_docs` counts the documents contributing ≥1 token to the window.

    Rows with a NULL {id_col} are EXCLUDED in both engines: an id-less
    document has no deterministic place in the stream.

    Scale: the only corpus-wide shuffles are (a) the range-bucket exchange
    for the prefix sum (each document once: id, key, length, text) and
    (b) the seq_id reassembly (token parts — the output's own volume). The
    bucket-total cumulation collects ≤ n_buckets rows from a narrow
    count-only side-plan (no md5 hashing); token ids materialize exactly
    once per document, after placement. No global sort anywhere; the
    documented-scalable shape of pack_token_budget_scalable applied to the
    whole-corpus "one group" case."""
    import math

    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    # Rows with NULL id are excluded IN BOTH ENGINES (the twin filters too):
    # an id-less document has no deterministic place in the stream — silently
    # keeping it would order it by engine whim and break parity.
    key = _sample_key(id_col)
    # Java/DuckDB `%` keep the dividend's sign, so negative 64-bit ids yield
    # NEGATIVE keys in (-2^31, 0). Shifting by 2^31 maps the full key domain
    # monotonically onto [0, 2^32), and the bucket is the shifted key's top
    # bits (F.shiftright — integer-exact, the same range-partitioner shape as
    # pack_token_budget_scalable; float-division truncation would send small
    # negative keys to bucket 0 but large ones to bucket -29).
    shift = 32 - int(math.log2(n_buckets))
    # _len WITHOUT token ids: the totals pass must not pay per-token md5
    # hashing — counting matches len(token_ids_col(...)) by construction
    # (word tokens + one EOS).
    n_tok = F.size(
        F.regexp_extract_all(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(TOKEN_RE), 0
        )
    )
    base = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        key.alias("_k"),
        (n_tok + 1).cast("long").alias("_len"),
    )
    base = base.withColumn(
        "_bkt", F.shiftright(F.col("_k") + F.lit(_LCG_M), shift).cast("int")
    )

    from pyspark.sql import Window

    w = (
        Window.partitionBy("_bkt")
        .orderBy("_k", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_cum", F.sum("_len").over(w))

    # bounded driver state: ≤ n_buckets rows, the same collect budget as IVF
    # centroid training / fit_bucket_ratios; this narrow plan never tokenizes
    # to ids (no md5), only counts
    totals = {
        r["_bkt"]: r["t"]
        for r in base.groupBy("_bkt").agg(F.sum("_len").alias("t")).collect()
    }
    off, offsets = 0, {}
    for b in range(n_buckets):
        offsets[b] = off
        off += int(totals.get(b, 0))
    off_map = F.create_map(
        *[x for b, o in sorted(offsets.items()) for x in (F.lit(b), F.lit(o))]
    )
    # exclusive global start offset of each doc's first token
    placed = local.withColumn(
        "_start", F.col("_cum") - F.col("_len") + off_map[F.col("_bkt")]
    )

    L = F.lit(int(seq_len))
    # integer DIV, not double division: at _start ≈ 2^52 the FP quotient's
    # ulp exceeds 1/L and floor-via-double can mis-assign a window — the
    # twin's `//` is exact, so this side must be too
    s0 = F.expr(f"_start DIV {int(seq_len)}")
    s1 = F.expr(f"(_start + _len - 1) DIV {int(seq_len)}")
    # token ids materialize HERE, once per document (the totals pass above
    # never hashed); the exploded windows carry the same array reference
    parts = placed.withColumn(
        "_ids", token_ids_col(F.col("_text"), vocab_size)
    ).select(
        "_id",
        "_start",
        "_ids",
        "_len",
        F.explode(F.sequence(s0, s1)).alias("seq_id"),
    )
    # token-index range [a, b) of this doc that falls into window seq_id
    a = F.greatest(F.lit(0).cast("long"), F.col("seq_id") * L - F.col("_start"))
    b_ = F.least(F.col("_len"), (F.col("seq_id") + 1) * L - F.col("_start"))
    parts = parts.select(
        "seq_id",
        (F.col("_start") + a - F.col("seq_id") * L).cast("int").alias("_pos"),
        F.slice(F.col("_ids"), (a + 1).cast("int"), (b_ - a).cast("int")).alias(
            "_part"
        ),
    )
    assembled = (
        parts.groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("_pos"), F.col("_part")))
                    ),
                    lambda s: s["_part"],
                )
            ).alias("input_ids"),
            F.count(F.lit(1)).cast("int").alias("n_docs"),
        )
        .select(
            "seq_id",
            "input_ids",
            F.size("input_ids").alias("n_tokens"),
            "n_docs",
            (F.size("input_ids") == F.lit(int(seq_len))).alias("complete"),
        )
    )
    return assembled


def pack_sequences_sql(
    table: str,
    id_col: str,
    text_col: str,
    seq_len: int,
    vocab_size: int = VOCAB_SIZE,
) -> str:
    """DuckDB twin: plain global ordered window for the prefix sum (the
    two-phase decomposition changes the plan, never the offsets), identical
    hash ids, slicing, and reassembly."""
    from data_quality_check_spark.operators.curation import _sample_key_sql

    key = _sample_key_sql(id_col)
    ids = token_ids_sql(text_col, vocab_size)
    return f"""
WITH _sq_docs AS (
  SELECT {id_col} AS _id, {key} AS _k, {ids} AS _ids FROM {table}
  WHERE {id_col} IS NOT NULL
),
placed AS (
  SELECT _id, _ids, CAST(len(_ids) AS BIGINT) AS _len,
         CAST(sum(len(_ids)) OVER (ORDER BY _k, _id
                                   ROWS UNBOUNDED PRECEDING)
              - len(_ids) AS BIGINT) AS _start
  FROM _sq_docs
),
parts AS (
  SELECT p.seq_id,
         CAST(p._start + p.a - p.seq_id * {seq_len} AS INT) AS _pos,
         list_slice(p._ids, p.a + 1, p.b) AS _part
  FROM (
    SELECT _id, _ids, _len, _start, s.seq_id,
           greatest(0, s.seq_id * {seq_len} - _start) AS a,
           least(_len, (s.seq_id + 1) * {seq_len} - _start) AS b
    FROM placed,
         LATERAL unnest(generate_series(_start // {seq_len},
                                        (_start + _len - 1) // {seq_len})) AS s(seq_id)
  ) p
),
assembled AS (
  SELECT seq_id,
         flatten(list_transform(
           list_sort(list({{'p': _pos, 'part': _part}})), s -> s['part']
         )) AS input_ids,
         CAST(count(*) AS INT) AS n_docs
  FROM parts GROUP BY seq_id
)
SELECT CAST(seq_id AS BIGINT) AS seq_id, input_ids,
       CAST(len(input_ids) AS INT) AS n_tokens, n_docs,
       len(input_ids) = {seq_len} AS complete
FROM assembled
"""
