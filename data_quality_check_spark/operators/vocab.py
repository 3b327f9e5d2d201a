"""Corpus vocabulary statistics: top-k token heavy hitters with term and
document frequency — the tf/df building block for vocab audits, boilerplate
detection, and stopword discovery over a crawl.

The reference profiles per-column value samples (engine.py:83-87 caps at 30
rows) but has no corpus-level term statistics; a training-data pipeline needs
them over the full corpus, distributed.

Scale notes (100 TB):
  * tokenization is ONE JVM-side `regexp_extract_all` + `explode` projection —
    no Python, no pre-shuffle materialization of the token table;
  * the aggregate is `groupBy(token)` with count + exact distinct-doc count:
    Spark plans the distinct as a two-phase partial aggregate, so only the
    deduplicated (token, doc_id) pairs shuffle — combiner-friendly on both
    phases. Zipf guarantees the head tokens are hot keys, but partial
    aggregation absorbs the skew map-side (each task emits one row per
    (token, doc_id) it saw);
  * top-k is `orderBy(...).limit(k)` — Spark compiles this to
    TakeOrderedAndProject (per-partition bounded heap, driver merges k rows
    per partition), never a global sort. A plan test pins the node.

Token alphabet is `[a-z0-9]+` over lowercased text — inside the Java-regex ∩
RE2 subset (functions/text.py:32-46), so the DuckDB oracle twin tokenizes
byte-identically; non-ASCII letters act as separators in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "[a-z0-9]+"


def top_tokens(
    df: DataFrame, id_col: str, text_col: str, k: int = 25, min_len: int = 1
) -> DataFrame:
    """Top-k corpus tokens by occurrence count (ties broken by token asc,
    so the k-boundary is deterministic across engines and partitionings).

    Output: (token, n_occurrences, n_docs) — term frequency and document
    frequency per surviving token.
    """
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("token"),
    )
    if min_len > 1:
        toks = toks.filter(F.length("token") >= min_len)
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("_doc").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def vocab_partial(
    df: DataFrame,
    bucket_col: str,
    id_col: str,
    text_col: str,
    m: int = 256,
    min_len: int = 1,
) -> DataFrame:
    """One MERGEABLE heavy-hitters summary row per bucket (VERDICT r3 task 7)
    — the frequent-items counterpart of `partials.partial_profile`'s HLL/KLL
    columns, so vocab audits also skip rescans: each ingest batch writes its
    buckets' summaries next to the data; corpus-wide top tokens are a merge
    over summary rows, never a token-table rescan.

    Schema per row:
      (bucket, total_tokens, cap, items: array<struct<token, n_occurrences,
       n_docs, err>>)
    where `items` is the bucket's EXACT per-token stats truncated to the top-m
    by occurrences (the SpaceSaving/Misra-Gries parallel-merge shape: a
    truncated exact summary IS an MG summary), and `cap` is the largest
    occurrence count the truncation dropped (0 if nothing was dropped). `cap`
    is what makes the merge honest: a token absent from this bucket's items
    has a count here of at most `cap`, so merged counts carry a certified
    upper bound (see `merge_vocab_partials`). `err` is the retained token's
    OWN slack — 0 on a fresh build (retained counts are exact for the rows
    summarized) and accumulated by `compact_vocab_partials`, where a token
    retained in some constituent summaries but truncated out of others can
    hide up to the missing summaries' caps behind its retained count.

    `n_docs` sums exactly across buckets/batches because bucketing is by
    document (the pipeline's bucket(B, id) layout): a document contributes to
    exactly one summary row per batch.

    Cost: the same tokenize + two-phase (bucket, token) aggregate as
    `top_tokens`, plus one window rank per bucket — all JVM-side; at 10^12
    rows this runs per ingest batch over only that batch's rows."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(bucket_col).alias("bucket"),
        F.col(id_col).alias("_doc"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("token"),
    )
    if min_len > 1:
        toks = toks.filter(F.length("token") >= min_len)
    stats = toks.groupBy("bucket", "token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("_doc").alias("n_docs"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.desc("n_occurrences"), F.asc("token")
    )
    ranked = stats.withColumn("_rk", F.row_number().over(w))
    return ranked.groupBy("bucket").agg(
        F.sum("n_occurrences").alias("total_tokens"),
        F.coalesce(
            F.max(F.when(F.col("_rk") > m, F.col("n_occurrences"))), F.lit(0)
        ).alias("cap"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("_rk") <= m,
                    F.struct(
                        F.col("_rk").alias("rk"),
                        F.col("token").alias("token"),
                        F.col("n_occurrences").alias("n_occurrences"),
                        F.col("n_docs").alias("n_docs"),
                    ),
                )
            )
        ).alias("items"),
    ).withColumn(  # rk made the sort deterministic; drop it from the artifact
        "items",
        F.transform(
            F.col("items"),
            lambda s: F.struct(
                s["token"].alias("token"),
                s["n_occurrences"].alias("n_occurrences"),
                s["n_docs"].alias("n_docs"),
                F.lit(0).cast("long").alias("err"),  # fresh build: counts exact
            ),
        ),
    )


def merge_vocab_partials(parts: DataFrame, k: int = 25) -> DataFrame:
    """Global top-k tokens from heavy-hitters summary rows (any number of
    batches × buckets) — no rescan of any text.

    Output: (token, n_occurrences, n_docs, n_occurrences_ub, certified)
      * n_occurrences / n_docs — sums of the retained per-bucket stats: a
        LOWER bound on the true count (exact when the token was retained in
        every summary covering a bucket/batch where it occurs);
      * n_occurrences_ub — certified upper bound: lower bound + the token's
        own accumulated `err` slack (nonzero only after compaction) + Σ cap
        over summary rows the token is ABSENT from (it can hide at most `cap`
        occurrences in each);
      * certified — true iff n_occurrences_ub == n_occurrences, i.e. every
        summary not listing the token dropped nothing AND the token carries
        no compaction slack, so the count is PROVABLY exact (the
        safety-margin check: pick m so the fixture's top-k certifies, and
        the merge equals the exact rescan).

    Ranking is by lower bound (desc, token asc) — the MG merge convention;
    callers needing a certified top-k SET additionally check that the k-th
    lower bound beats every excluded token's upper bound
    (`vocab_topk_certified`)."""
    return (
        _merged_vocab(parts)
        .select("token", "n_occurrences", "n_docs", "n_occurrences_ub", "certified")
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def _merged_vocab(parts: DataFrame) -> DataFrame:
    """ALL merged tokens with bounds — the single aggregation both
    merge_vocab_partials and vocab_topk_certified rank from (one shared
    builder, one explode+agg pass). `_total_cap` rides along so the
    certification check never needs a second aggregate over summaries."""
    exploded = parts.select(
        F.col("cap"), F.explode(F.col("items")).alias("it")
    ).select(
        "cap",
        F.col("it.token").alias("token"),
        F.col("it.n_occurrences").alias("n_occurrences"),
        F.col("it.n_docs").alias("n_docs"),
        F.col("it.err").alias("err"),
    )
    per_token = exploded.groupBy("token").agg(
        F.sum("n_occurrences").alias("n_occurrences"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("cap").alias("_present_caps"),
        F.sum("err").alias("_err"),
    )
    total_cap = parts.agg(F.sum("cap").alias("_total_cap"))
    return per_token.crossJoin(F.broadcast(total_cap)).select(
        "token",
        "n_occurrences",
        "n_docs",
        (
            F.col("n_occurrences")
            + F.col("_err")
            + F.col("_total_cap")
            - F.col("_present_caps")
        ).alias("n_occurrences_ub"),
        "_total_cap",
    ).withColumn("certified", F.col("n_occurrences_ub") == F.col("n_occurrences"))


def vocab_topk_certified(parts: DataFrame, k: int = 25) -> bool:
    """True iff the merged top-k SET is provably the exact top-k: every
    retained token's count is certified AND the k-th count is ≥ the upper
    bound of every token outside the top-k (including never-retained tokens,
    whose bound is Σ cap). ONE pass over the summaries: the merged token
    table is pinned, the top-k collect computes it, and the excluded-token
    bound reads the cache — previously three separate jobs each re-derived
    the explode+aggregate."""
    from pyspark.storagelevel import StorageLevel

    merged = _merged_vocab(parts).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        top = (
            merged.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
            .limit(k)
            .collect()
        )
        if len(top) < k or not all(r["certified"] for r in top):
            return False
        kth = top[-1]["n_occurrences"]
        topset = [r["token"] for r in top]
        row = (
            merged.filter(~F.col("token").isin(topset))
            .agg(
                F.max("n_occurrences_ub").alias("worst"),
                F.max("_total_cap").alias("tc"),
            )
            .collect()[0]
        )
        worst = row["worst"]
        # excluded set may be empty (every merged token is in the top-k);
        # Σ cap then comes from the top rows, which carry it too
        total_cap = int(row["tc"] if row["tc"] is not None else top[0]["_total_cap"] or 0)
    finally:
        merged.unpersist()
    hidden_bound = max(worst or 0, total_cap)  # never-retained tokens ≤ Σ cap
    # STRICT: at kth == hidden_bound an excluded token could tie the k-th
    # count and win the (count desc, token asc) tie-break — the SET would
    # depend on a name the summaries may not even retain, so refuse.
    return kth > hidden_bound


def compact_vocab_partials(parts: DataFrame, m: int = 256) -> DataFrame:
    """Re-emit one summary row per bucket from many (batches × buckets) rows —
    the periodic compaction step, same role as `partials.compact_partials`.

    Retained counts sum exactly over the summaries that LISTED the token; the
    occurrences a constituent summary truncated away instead land in the
    retained token's `err` slack: err_new = Σ err over listing summaries +
    Σ cap over the bucket's summaries that did NOT list it (it can hide at
    most `cap` in each). That keeps `merge_vocab_partials`' invariant — a
    listed token's true count ∈ [n_occurrences, n_occurrences + err] — true
    ACROSS compaction, so certificates stay sound: a token whose count became
    uncertain is visibly uncertain (err > 0), never silently "exact".

    The compacted row's `cap` bounds every token NOT in the new items:
    greatest(Σ old caps — covers tokens no constituent listed — and the
    largest (count + err) the re-truncation dropped)."""
    from pyspark.sql import Window

    exploded = parts.select(
        "bucket", F.col("cap").alias("_row_cap"), F.explode("items").alias("it")
    ).select(
        "bucket",
        "_row_cap",
        F.col("it.token").alias("token"),
        F.col("it.n_occurrences").alias("n_occurrences"),
        F.col("it.n_docs").alias("n_docs"),
        F.col("it.err").alias("err"),
    )
    sums = parts.groupBy("bucket").agg(
        F.sum("total_tokens").alias("total_tokens"),
        F.sum("cap").alias("_old_caps"),
    )
    # per (bucket, token): exact sums over listing summaries, plus the caps of
    # those summaries (a token appears at most once per summary row, so
    # sum(_row_cap) here is exactly Σ cap over listing rows)
    stats = (
        exploded.groupBy("bucket", "token")
        .agg(
            F.sum("n_occurrences").alias("n_occurrences"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("err").alias("_err_listed"),
            F.sum("_row_cap").alias("_listed_caps"),
        )
        .join(sums.select("bucket", "_old_caps"), "bucket")
        .withColumn(
            "err",
            F.col("_err_listed") + F.col("_old_caps") - F.col("_listed_caps"),
        )
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("n_occurrences"), F.asc("token"))
    ranked = stats.withColumn("_rk", F.row_number().over(w))
    folded = ranked.groupBy("bucket").agg(
        F.coalesce(
            F.max(
                F.when(F.col("_rk") > m, F.col("n_occurrences") + F.col("err"))
            ),
            F.lit(0),
        ).alias("_dropped_ub"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("_rk") <= m,
                    F.struct(
                        F.col("_rk").alias("rk"),
                        F.col("token").alias("token"),
                        F.col("n_occurrences").alias("n_occurrences"),
                        F.col("n_docs").alias("n_docs"),
                        F.col("err").alias("err"),
                    ),
                )
            )
        ).alias("items"),
    )
    return (
        folded.join(sums, "bucket")
        .select(
            "bucket",
            "total_tokens",
            F.greatest(F.col("_old_caps"), F.col("_dropped_ub")).alias("cap"),
            F.transform(
                F.col("items"),
                lambda s: F.struct(
                    s["token"].alias("token"),
                    s["n_occurrences"].alias("n_occurrences"),
                    s["n_docs"].alias("n_docs"),
                    s["err"].alias("err"),
                ),
            ).alias("items"),
        )
    )


def top_tokens_sql(
    table: str, id_col: str, text_col: str, k: int = 25, min_len: int = 1
) -> str:
    """DuckDB twin of `top_tokens` (same tokenizer subset, same tie-break)."""
    where = f"WHERE length(token) >= {min_len}" if min_len > 1 else ""
    return f"""
SELECT token, count(*) AS n_occurrences, count(DISTINCT _doc) AS n_docs
FROM (SELECT {id_col} AS _doc,
             unnest(regexp_extract_all(lower({text_col}), '{TOKEN_RE}')) AS token
      FROM {table}) {where}
GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {k}
"""


def top_bigrams(
    df: DataFrame, id_col: str, text_col: str, k: int = 25, min_len: int = 1
) -> DataFrame:
    """Top-k adjacent token PAIRS by occurrence count — the boilerplate
    detector `top_tokens` can't be: repeated template phrases ("all rights
    reserved", "click here to") surface as heavy bigrams long before their
    constituent unigrams stand out against the Zipf head.

    Tokens shorter than `min_len` are removed BEFORE pairing (pairs are
    adjacent in the FILTERED sequence, so stopword-length noise doesn't split
    phrases). Ties break by bigram asc — deterministic k-boundary.

    Output: (bigram, n_occurrences, n_docs).

    Scale: the whole pairing is ONE JVM projection (regexp tokenize →
    length-filter → zip of the two shifted slices) — no Python, no window, no
    per-doc shuffle; then the identical two-phase partial-distinct aggregate
    and TakeOrderedAndProject top-k as `top_tokens` (same skew absorption,
    same never-a-global-sort)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    if min_len > 1:
        toks = F.filter(toks, lambda t: F.length(t) >= min_len)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    exploded = df.select(
        F.col(id_col).alias("_doc"), F.explode(pairs).alias("bigram")
    )
    return (
        exploded.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("_doc").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("bigram").asc())
        .limit(k)
    )


def top_bigrams_sql(
    table: str, id_col: str, text_col: str, k: int = 25, min_len: int = 1
) -> str:
    """DuckDB twin of `top_bigrams` (same tokenizer subset, same filter-before-
    pair semantics, same tie-break). DuckDB lists are 1-indexed; range(1, n)
    is end-exclusive, so i pairs toks[i] with toks[i+1] exactly like the
    shifted-slice zip."""
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}')"
    if min_len > 1:
        toks = f"list_filter({toks}, t -> length(t) >= {min_len})"
    return f"""
SELECT bigram, count(*) AS n_occurrences, count(DISTINCT _doc) AS n_docs
FROM (
  SELECT {id_col} AS _doc,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM (SELECT {id_col}, {toks} AS toks FROM {table})
)
GROUP BY bigram
ORDER BY n_occurrences DESC, bigram ASC
LIMIT {k}
"""


def token_fertility(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    token_re: str = TOKEN_RE,
) -> DataFrame:
    """Per-language tokenizer-fertility audit: token / char / byte volumes and
    the chars-per-token + bytes-per-token + tokens-per-doc ratios — the
    tokenizer-fit check a multilingual pipeline runs before committing a
    vocabulary (high bytes-per-token on a language = the tokenizer shatters
    it; cf. the fertility metrics in the BLOOM/XLM-R tokenizer analyses).

    Output: (lang, n_docs, n_tokens, n_chars, n_bytes, chars_per_token,
    bytes_per_token, tokens_per_doc). NULL lang is a group; NULL text counts
    as zero tokens/chars/bytes (COALESCE, matching the SQL twin). Ratios are
    ONE double division of exact integer sums, rounded to 6 dp — identical
    cross-engine; zero-token languages report NULL ratios rather than a
    division error.

    100 TB shape: one JVM projection (regexp token count — the token STREAM
    is never materialized, only its length) + one map-side-combined agg on
    ≤|langs| keys. No explode, no shuffle wider than the language count."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(lang_col).alias("lang"),
        F.size(
            F.regexp_extract_all(F.lower(txt), F.lit(token_re), 0)
        ).cast("long").alias("_toks"),
        F.length(txt).cast("long").alias("_chars"),
        F.octet_length(txt).cast("long").alias("_bytes"),
    )
    g = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_toks").alias("n_tokens"),
        F.sum("_chars").alias("n_chars"),
        F.sum("_bytes").alias("n_bytes"),
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0,
        F.round(F.col(num).cast("double") / F.col(den).cast("double"), 6),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_bytes",
        ratio("n_chars", "n_tokens").alias("chars_per_token"),
        ratio("n_bytes", "n_tokens").alias("bytes_per_token"),
        ratio("n_tokens", "n_docs").alias("tokens_per_doc"),
    )
