"""Incremental (micro-batch) variant of the image+caption quality filter.

Batch (`pipeline.run.run_filter`) is the canonical job — the north rule's
resume semantics come from its per-bucket checkpoint manifest. This module
covers the other operational shape: a landing directory that keeps receiving
new image files, filtered as they arrive.

Design:
  * file source `readStream.parquet` over the landing dir; the Structured
    Streaming checkpoint tracks processed files, so a restarted query is
    exactly-once over inputs without any manifest logic of our own;
  * `foreachBatch` reuses the batch pipeline verbatim — `score_rows` →
    `dup_decisions` → `finalize` — so keep/drop/scrub semantics are identical
    by construction (same code objects, covered by the batch golden tests);
  * per-batch metrics ride on `DataFrame.observe` exactly like the batch job
    and are appended to the same `run_metrics` layout, keyed by batch_id.

Dedup layering: `dup_decisions` inside a micro-batch collapses duplicates
within that batch; `dedup_within` additionally drops CROSS-batch re-deliveries
with keyed state (`dropDuplicatesWithinWatermark` on an ingest timestamp):
first arrival wins, state retained only for the watermark delay, so state size
is bounded by (arrival rate × delay) keys — the retention bound a 10^12-row
stream needs. Cross-batch semantics differ from the batch job by design:
first-wins on re-delivery (the streaming at-least-once concern) vs min-id-wins
over the full corpus (the batch job still owns corpus-wide dedup).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from data_quality_check_spark.pipeline.fixtures import IMAGES_DDL
from data_quality_check_spark.pipeline.run import (
    DATA_COLS,
    DROP_REASONS,
    FilterConfig,
    _append_parquet,
    bucket_col,
    dup_decisions,
    finalize,
    score_rows,
    with_rid,
)
from data_quality_check_spark.pipeline.heuristics import FLAG_COLS, trim_col

OUT_COLS = DATA_COLS + ["lang", "lang_conf", "ppl", "scrubbed_caption", "_bucket"]


def read_image_stream(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: int | None = None,
    dedup_within: str | None = None,
    dedup_keys: list[str] | None = None,
) -> DataFrame:
    """File-source stream over a landing directory of image parquet files.

    File sources need an explicit schema (no inference mid-stream); it is the
    north-rule input shape (`IMAGES_DDL`). `maxFilesPerTrigger` bounds
    micro-batch size — at production rates, set it so one batch's `bytes`
    payload fits the executors' Arrow/python memory, same sizing rule as the
    batch job's input splits.

    `dedup_within` (e.g. "1 hour") turns on cross-batch re-delivery dedup:
    `dropDuplicatesWithinWatermark` on an ingest timestamp keyed by
    `dedup_keys` (default: image_id). First arrival wins; a duplicate landing
    in a later micro-batch inside the delay window is dropped, and the keyed
    state is evicted after the delay, bounding state size at any input rate."""
    reader = spark.readStream.schema(IMAGES_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_path)
    if dedup_within is not None:
        stream = (
            stream.withColumn("_ingest_ts", F.current_timestamp())
            .withWatermark("_ingest_ts", dedup_within)
            .dropDuplicatesWithinWatermark(dedup_keys or ["image_id"])
            .drop("_ingest_ts")
        )
    return stream


def run_stream_filter(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: FilterConfig | None = None,
    max_files_per_trigger: int | None = None,
    dedup_within: str | None = None,
) -> dict:
    """Drain all currently-available files through the filter and stop
    (`Trigger.AvailableNow`), writing kept rows append-only, bucket-partitioned.

    Returns {batches, rows_in, rows_kept}. Re-running after new files land
    processes ONLY the new files (streaming checkpoint), making this the
    incremental twin of the batch job's bucket-manifest resume. `dedup_within`
    enables cross-batch re-delivery dedup (see `read_image_stream`)."""
    cfg = cfg or FilterConfig()
    totals = {"batches": 0, "rows_in": 0, "rows_kept": 0}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        df = batch_df
        if "_bucket" not in df.columns:
            df = df.withColumn("_bucket", bucket_col(num_buckets=cfg.num_buckets))
        df = with_rid(df)
        dups = dup_decisions(df)  # batch-scope; see module docstring
        scored = finalize(score_rows(df, cfg), cfg, dups).withColumn(
            "_scrub_changed",
            F.col("row_selected")
            & ~F.col("scrubbed_caption").eqNullSafe(trim_col(F.col("caption"))),
        )
        obs = Observation(f"stream-metrics-{cfg.run_id}-{batch_id}")
        aggs = [
            F.count(F.lit(1)).alias("rows_in"),
            F.count_if(F.col("row_selected")).alias("rows_kept"),
            F.count_if(F.col("_scrub_changed")).alias("n_scrubbed"),
            *[F.count_if(F.col("drop_reason") == r).alias(f"n_{r}") for r in DROP_REASONS],
            *[F.count_if(F.col(c)).alias(c.replace("flag_", "nf_")) for c in FLAG_COLS],
        ]
        scored = scored.observe(obs, *aggs)
        kept = scored.filter(F.col("row_selected")).select(*OUT_COLS)
        kept = kept.repartition(cfg.num_buckets, F.col("_bucket"))
        (
            kept.write.mode("append")
            .partitionBy("_bucket")
            .option("compression", "uncompressed")
            .option("parquet.enable.dictionary", "false")
            .parquet(os.path.join(output_dir, "filtered"))
        )
        m = obs.get
        import pandas as pd

        row = {
            "run_id": cfg.run_id,
            "batch_id": int(batch_id),
            **{k: int(v) for k, v in m.items()},
        }
        pdf = pd.DataFrame([row])
        # µs unit explicitly: DataFrame-from-dict upcasts Timestamp scalars to
        # ns, which Spark's parquet reader rejects (TIMESTAMP(NANOS)).
        pdf["committed_at"] = pd.Series([pd.Timestamp.now(tz="UTC")]).dt.as_unit("us")
        _append_parquet(pdf, os.path.join(checkpoint_dir, "run_metrics"), cfg.run_id)
        totals["batches"] += 1
        totals["rows_in"] += int(m["rows_in"])
        totals["rows_kept"] += int(m["rows_kept"])

    stream = read_image_stream(spark, input_path, max_files_per_trigger, dedup_within)
    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "stream"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return totals
