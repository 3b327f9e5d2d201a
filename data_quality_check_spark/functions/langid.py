"""Language-ID + perplexity as Arrow-vectorized pandas UDFs.

Iterator-form `pandas_udf` so the trigram model is materialized once per executor
python worker, then reused across Arrow batches (the fastText-style pattern from
SURVEY.md §2.10). No per-row Python: each batch is scored by the numpy kernels in
`functions/textmodel.py` over one contiguous byte buffer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

LANGID_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("lang_conf", DoubleType()),
    ]
)


@F.pandas_udf(LANGID_SCHEMA)
def langid_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    from data_quality_check_spark.functions.textmodel import default_model

    model = default_model()  # cached per python worker
    for texts in batches:
        langs, conf, _ = model.predict(texts.fillna("").tolist())
        yield pd.DataFrame({"lang": langs, "lang_conf": conf})


@F.pandas_udf(DoubleType())
def perplexity_udf(batches: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    from data_quality_check_spark.functions.textmodel import default_model

    model = default_model()
    for texts, langs in batches:
        ppl = model.perplexity(texts.fillna("").tolist(), langs.fillna("und").tolist())
        yield pd.Series(ppl)


def with_langid(df, caption_col: str = "caption"):
    """Adds `lang` and `lang_conf` columns (map-side; no shuffle).

    asNondeterministic = optimizer fence (pure UDF): stops Catalyst pushing a
    downstream filter through this projection and re-evaluating the model UDF
    once per reference (see fused.py for the measured 2x)."""
    s = langid_udf.asNondeterministic()(F.col(caption_col))
    return df.withColumn("_lid", s).select("*", "_lid.lang", "_lid.lang_conf").drop("_lid")


def with_perplexity(df, caption_col: str = "caption", lang_col: str = "lang"):
    """Adds `ppl` (map-side; per-language model rows are all in the broadcast-free
    in-process table — see perplexity_grouped for the salted shuffle variant)."""
    return df.withColumn(
        "ppl", perplexity_udf.asNondeterministic()(F.col(caption_col), F.col(lang_col))
    )


def perplexity_grouped(df, caption_col: str = "caption", lang_col: str = "lang",
                       salt_buckets: int = 8, id_col: str = "rid"):
    """Perplexity via `applyInPandas` grouped on a **salted** language key.

    This is the scale path the north_rule names: when per-language models are too
    large to hold all-at-once per worker, group rows by language so each task loads
    ONE model. Language frequency is Zipfian (one language ≈70% of rows), so the
    group key is salted — `concat(lang, '#', xxhash64(id) % S)` — splitting the hot
    language into S balanced shuffle partitions. Results are bit-identical to
    `with_perplexity` (same kernels), verified in tests.

    Only the narrow (id, caption, lang) projection crosses the salted shuffle and
    the Arrow boundary — never `bytes` (SURVEY.md §7.3: wide rows must not
    shuffle; the original full-row applyInPandas moved every image's bytes
    through Arrow twice and broke 8g executors at 8M rows). The (id, ppl) result
    joins back on `id_col`, which must be UNIQUE per physical row (the
    pipeline's `rid`) — joining on a duplicated key would fan rows out. On the
    bucketed production layout this join is storage-partitioned; here AQE picks
    the strategy.
    """
    from data_quality_check_spark.functions.textmodel import default_model

    out_schema = StructType([df.schema[id_col], StructField("ppl", DoubleType())])
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    salted = df.select(id_col, caption_col, lang_col).withColumn(
        "_salted_lang", F.concat_ws("#", F.col(lang_col), salt)
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        model = default_model()
        ppl = model.perplexity(
            pdf[caption_col].fillna("").tolist(), pdf[lang_col].fillna("und").tolist()
        )
        return pd.DataFrame({id_col: pdf[id_col], "ppl": ppl})

    scored = salted.groupBy("_salted_lang").applyInPandas(score_group, out_schema)
    return df.join(scored, id_col)
