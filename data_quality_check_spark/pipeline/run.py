"""The north-star job: image+caption quality filter with checkpointed resume.

    read (bucket-pruned) → heuristic flags (pure expressions)
      → decode-check UDF (map-side, bytes never shuffled)
      → langid UDF → perplexity UDF (map-side default; salted-group option)
      → dedup winners (narrow projection, broadcast anti-join of losers)
      → keep/drop decision + scrub → bucket-partitioned write
      → per-bucket metrics + checkpoint manifest append

Scale design notes (SURVEY.md §3.4, §4.2):
  * `bytes` flows only through map stages; every shuffle/groupBy operates on a
    projection without it. The one exception — the same-image_id duplicate collapse
    at the end — is a shuffle by image_id which on the production Iceberg layout
    (`bucket(B, image_id)`) is storage-partitioned and therefore shuffle-free; in
    the parquet sandbox it shuffles only the ~kept rows of pending buckets.
  * resume = anti-filter on the manifest's completed-bucket list (partition pruning
    when the input is already bucket-partitioned). Output uses dynamic partition
    overwrite so re-processing a bucket after a crash is idempotent.
  * per-language skew: `perplexity_grouped` salts the Zipf-heavy language key
    before its shuffle (ppl_mode="grouped"); the default map-side mode needs no
    shuffle at all.
  * single heavy pass: the scored rows feed the filtered write, the per-bucket
    metrics, and the run summary — `scored` is persisted so the scan+UDF pipeline
    executes once; metrics/manifest are written from the ≤num_buckets collected
    aggregate rows (driver-side), not by extra cluster scans.

Run via spark-submit:
    spark-submit --py-files dqx.zip -m data_quality_check_spark.pipeline.run \
        --input <parquet/iceberg> --output <dir> --checkpoint <dir>
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from data_quality_check_spark.functions.langid import (
    perplexity_grouped,
    with_langid,
    with_perplexity,
)
from data_quality_check_spark.functions.fused import with_model_scores_fused
from data_quality_check_spark.functions.multimodal import with_decode_check
from data_quality_check_spark.functions.scrub import scrub_col
from data_quality_check_spark.pipeline.heuristics import FLAG_COLS, heuristic_ok, with_flags

DATA_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


@contextmanager
def _step(name: str):
    """Wall-time a job step to stderr when SPARK_GRAFT_TIMING is set."""
    import sys

    t0 = time.perf_counter()
    yield
    if os.environ.get("SPARK_GRAFT_TIMING"):
        print(f"[timing] {name}: {time.perf_counter() - t0:.2f}s", file=sys.stderr, flush=True)


@dataclass
class FilterConfig:
    target_langs: list[str] | None = None  # None → all model languages
    min_lang_conf: float = 0.15
    max_ppl: float = 30_000.0
    num_buckets: int = 64  # checkpoint/commit granularity; also the write-task fan-out
    salt_buckets: int = 8
    ppl_mode: str = "map"  # "map" (fused, no shuffle) | "modular" | "grouped" (salted)
    run_id: str = field(default_factory=lambda: f"run-{int(time.time())}")


def bucket_col(id_col: str = "image_id", num_buckets: int = 16) -> F.Column:
    """Deterministic bucket id — the parquet stand-in for Iceberg bucket(B, image_id)."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).cast("int")


def completed_buckets(spark: SparkSession, checkpoint_dir: str) -> list[int]:
    path = os.path.join(checkpoint_dir, "manifest")
    try:
        rows = spark.read.parquet(path).select("bucket").distinct().collect()
        return sorted(r["bucket"] for r in rows)
    except Exception:
        return []


def dup_losers(df: DataFrame) -> DataFrame:
    """image_ids losing their phash group (winner = min image_id), computed on the
    (image_id, phash) projection — a narrow columnar scan, no wide rows shuffled.

    MUST be computed over the FULL input, not a bucket subset: phash groups span
    buckets, and a resumed run has to pick the same winners a fresh run would.
    Only ids from multi-id groups are returned (~duplicate rate · n), small enough
    to broadcast; at 10^12 scale this becomes a bucketed intermediate table keyed
    by image_id instead of a broadcast.
    """
    narrow = df.select("image_id", "phash")
    groups = narrow.groupBy("phash").agg(
        F.min("image_id").alias("winner"), F.count_distinct("image_id").alias("n_ids")
    )
    return (
        narrow.join(groups.filter(F.col("n_ids") > 1), "phash")
        .filter(F.col("image_id") != F.col("winner"))
        .select("image_id")
        .distinct()
    )


def score_rows(df: DataFrame, cfg: FilterConfig) -> DataFrame:
    """The heavy per-row stages: heuristic flags + the model UDFs. No shuffle,
    no dup information — this is the (single) expensive pass worth caching."""
    df = with_flags(df)
    if cfg.ppl_mode == "grouped":
        # scale path for oversized per-language models: modular UDFs + salted
        # applyInPandas shuffle (language keys are Zipfian)
        df = with_decode_check(df)
        df = with_langid(df)
        df = perplexity_grouped(df, salt_buckets=cfg.salt_buckets)
    elif cfg.ppl_mode == "modular":
        df = with_decode_check(df)
        df = with_langid(df)
        df = with_perplexity(df)
    else:  # "map" — fused: ONE python crossing for decode+langid+ppl
        df = with_model_scores_fused(df)
    return df


def decide(df: DataFrame, cfg: FilterConfig, losers: DataFrame | None = None) -> DataFrame:
    """All per-row scoring stages; adds flags, lang, ppl, dup flag, keep, reason."""
    if losers is None:
        losers = dup_losers(df)
    return finalize(score_rows(df, cfg), cfg, losers)


def finalize(df: DataFrame, cfg: FilterConfig, losers: DataFrame) -> DataFrame:
    """Cheap tail over scored rows: dup broadcast join, keep/drop decision,
    drop reason, scrub — pure expressions, recomputable from a cached input."""
    from data_quality_check_spark.functions.textmodel import default_model

    target = cfg.target_langs or default_model().langs

    df = df.join(F.broadcast(losers.withColumn("flag_duplicate", F.lit(True))), "image_id", "left")
    df = df.withColumn("flag_duplicate", F.coalesce(F.col("flag_duplicate"), F.lit(False)))

    lang_ok = F.col("lang").isin(list(target)) & (F.col("lang_conf") >= cfg.min_lang_conf)
    ppl_ok = F.col("ppl") <= cfg.max_ppl
    keep = (
        heuristic_ok()
        & ~F.col("flag_decode_failed")
        & lang_ok
        & ppl_ok
        & ~F.col("flag_duplicate")
    )
    df = df.withColumn("keep", keep)

    # first-match drop reason, priority-ordered (mirrors reference_impl.DROP_PRIORITY)
    reason = F.lit(None).cast("string")
    pairs = [
        ("caption_missing", F.col("flag_caption_missing")),
        ("fake_null", F.col("flag_fake_null")),
        ("too_short", F.col("flag_too_short")),
        ("too_long", F.col("flag_too_long")),
        ("low_alpha", F.col("flag_low_alpha")),
        ("repetitive", F.col("flag_repetitive")),
        ("bad_dims", F.col("flag_bad_dims")),
        ("bytes_implausible", F.col("flag_bytes_implausible")),
        ("decode_failed", F.col("flag_decode_failed")),
        ("language", ~lang_ok),
        ("perplexity", ~ppl_ok),
        ("duplicate", F.col("flag_duplicate")),
    ]
    expr = F.when(pairs[0][1], pairs[0][0])
    for name, cond in pairs[1:]:
        expr = expr.when(cond, name)
    df = df.withColumn("drop_reason", expr)
    return df.withColumn(
        "scrubbed_caption",
        F.when(F.col("keep"), scrub_col(F.trim(F.col("caption")))),
    )


def _rows_to_pdf(rows):
    """Collected Rows → pandas frame with parquet-stable dtypes (int64 counters,
    UTC-adjusted timestamps so Spark reads TimestampType back, not NTZ)."""
    import pandas as pd

    pdf = pd.DataFrame([r.asDict() for r in rows])
    for c in pdf.columns:
        if c == "committed_at":
            # micros, not pandas-default nanos: Spark rejects TIMESTAMP(NANOS)
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize("UTC").astype("datetime64[us, UTC]")
        elif pdf[c].dtype.kind == "i":
            pdf[c] = pdf[c].astype("int64")
    return pdf


def _append_parquet(pdf, dir_path: str, run_id: str) -> None:
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)
    fname = f"part-{run_id}-{uuid.uuid4().hex[:8]}.parquet"
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), os.path.join(dir_path, fname))


def run_filter(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: FilterConfig | None = None,
    max_buckets: int | None = None,
) -> dict:
    """Execute (or resume) the filter job. `max_buckets` limits how many pending
    buckets are processed this invocation (used by the kill/resume tests).

    Returns a summary dict {processed_buckets, rows_in, rows_kept}.
    """
    cfg = cfg or FilterConfig()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    df = spark.read.parquet(input_path).withColumn("_bucket", bucket_col(num_buckets=cfg.num_buckets))

    done = completed_buckets(spark, checkpoint_dir)
    pending = [b for b in range(cfg.num_buckets) if b not in done]
    if max_buckets is not None:
        pending = pending[:max_buckets]
    if not pending:
        return {"processed_buckets": [], "rows_in": 0, "rows_kept": 0}

    # bucket prune: on Iceberg/bucketed-parquet layouts this is partition pruning;
    # on a flat file it is a pushed-down filter.
    work = df.filter(F.col("_bucket").isin(pending))

    # The scored rows feed THREE actions (filtered write, metrics, summary);
    # without a persist each one re-executes the whole scan+UDF pipeline, tripling
    # the job. Locally this caches in memory; at warehouse scale the equivalent is
    # writing the scored table once (Iceberg) and deriving the views from it.
    scored_base = score_rows(work, cfg).persist(StorageLevel.MEMORY_AND_DISK)

    # dedup winners come from the FULL input (phash groups span buckets, so a
    # resumed run must crown the same winners a fresh run would) via a narrow
    # (image_id, phash) columnar scan. Deliberately NOT derived from the scored
    # cache: that would serialize cache materialization into this small job and
    # steal the overlap between UDF compute and the filtered write below.
    losers = dup_losers(df).persist(StorageLevel.MEMORY_AND_DISK)
    with _step("losers"):
        losers.count()
    scored = finalize(scored_base, cfg, losers)

    out_cols = DATA_COLS + ["lang", "lang_conf", "ppl", "scrubbed_caption", "_bucket"]
    kept = (
        scored.filter(F.col("keep"))
        .select(*out_cols)
        .dropDuplicates(["image_id"])  # same-id exact dups collapse; see module doc
        # One file per bucket: without this, partitionBy fans every task out
        # across all buckets (tasks × buckets files) and the driver-side dynamic
        # commit renames them serially. image_id determines _bucket, so this
        # cheap kept-rows-only shuffle loses nothing; on Iceberg bucket(B,
        # image_id) layout both shuffles are storage-partitioned away entirely.
        .repartition(cfg.num_buckets, F.col("_bucket"))
    )
    with _step("score+write"):
        (
            kept.write.mode("overwrite")
            .partitionBy("_bucket")
            # rows are bytes-dominated and image bytes are already codec-compressed;
            # container-level snappy would burn write+read CPU for ~0% size win
            .option("compression", "uncompressed")
            .parquet(os.path.join(output_dir, "filtered"))
        )

    # per-bucket metrics (narrow aggregation — bytes already dropped) + lineage.
    # ONE distributed action: the ≤num_buckets aggregate rows are collected to the
    # driver, and the metrics/manifest checkpoint tables are written from those
    # local rows — three cluster-wide scans replaced by one plus two trivial jobs.
    flag_sums = [F.count_if(F.col(c)).alias(c.replace("flag_", "n_")) for c in FLAG_COLS]
    metrics = (
        scored.drop("bytes")
        .groupBy("_bucket")
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            # distinct ids: same-id exact-dup rows collapse to one output row
            F.count_distinct(F.when(F.col("keep"), F.col("image_id"))).alias("rows_kept"),
            F.count_if(F.col("flag_duplicate")).alias("n_duplicate"),
            F.count_if(~F.col("keep") & (F.col("drop_reason") == "language")).alias("n_language"),
            F.count_if(~F.col("keep") & (F.col("drop_reason") == "perplexity")).alias("n_perplexity"),
            F.count_if(F.col("scrubbed_caption") != F.trim(F.col("caption"))).alias("n_scrubbed"),
            *flag_sums,
        )
        .withColumn("run_id", F.lit(cfg.run_id))
        .withColumn("committed_at", F.current_timestamp())
    )
    with _step("metrics_collect"):
        metric_rows = metrics.collect()
    # The checkpoint tables are ≤num_buckets driver-local rows; writing them with
    # pyarrow skips a whole Spark job each (scheduler + committer round-trips that
    # cost more than the data). Files land uniquely-named in the same parquet
    # dirs Spark reads back for resume.
    with _step("metrics_write"):
        if not metric_rows:  # pending buckets held zero rows; nothing to commit
            scored_base.unpersist()
            losers.unpersist()
            return {"processed_buckets": pending, "rows_in": 0, "rows_kept": 0}
        metrics_pdf = _rows_to_pdf(metric_rows)
        _append_parquet(metrics_pdf, os.path.join(checkpoint_dir, "metrics"), cfg.run_id)

        # manifest commit LAST: a bucket is only "done" once data + metrics landed
        manifest_pdf = metrics_pdf[["_bucket", "rows_in", "rows_kept", "run_id", "committed_at"]]
        manifest_pdf = manifest_pdf.rename(columns={"_bucket": "bucket"})
        _append_parquet(manifest_pdf, os.path.join(checkpoint_dir, "manifest"), cfg.run_id)

    scored_base.unpersist()
    losers.unpersist()
    return {
        "processed_buckets": pending,
        "rows_in": sum(r["rows_in"] for r in metric_rows),
        "rows_kept": sum(r["rows_kept"] for r in metric_rows),
    }


def main() -> None:  # pragma: no cover - CLI wrapper
    import argparse

    from data_quality_check_spark.session import get_spark

    p = argparse.ArgumentParser(description="image+caption quality-filter job")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--max-buckets", type=int, default=None)
    p.add_argument("--ppl-mode", choices=["map", "grouped"], default="map")
    args = p.parse_args()

    spark = get_spark(app_name="quality-filter", master=args.master)
    cfg = FilterConfig(ppl_mode=args.ppl_mode)
    summary = run_filter(spark, args.input, args.output, args.checkpoint, cfg, args.max_buckets)
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
