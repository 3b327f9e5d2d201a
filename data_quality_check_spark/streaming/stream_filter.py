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
  * per-batch metrics ride on `DataFrame.observe` with the batch job's own
    agg list (`run._bucket_metric_aggs`), written to a `stream_run_metrics`
    table keyed by batch_id (a separate table, not the batch `run_metrics` —
    mixing the two schemas in one directory would read back depending on
    which file Spark samples for the footer);
  * foreachBatch is at-least-once, so both side effects are IDEMPOTENT per
    batch_id: kept rows overwrite their own `_batch_id` partition (dynamic
    partition overwrite) and the metrics row lands at a deterministic
    per-batch filename — a replayed micro-batch replaces its own output
    instead of duplicating it.

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
    OUT_COLS,
    FilterConfig,
    _append_parquet,
    _bucket_metric_aggs,
    bucket_col,
    contamination_decisions,
    dup_decisions,
    finalize,
    score_rows,
    with_rid,
)
from data_quality_check_spark.pipeline.heuristics import trim_col


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
    seen_artifacts=None,
    content_dedup_threshold: float = 0.6,
) -> dict:
    """Drain all currently-available files through the filter and stop
    (`Trigger.AvailableNow`), writing kept rows append-only, bucket-partitioned.

    Returns {batches, rows_in, rows_kept}. Re-running after new files land
    processes ONLY the new files (streaming checkpoint), making this the
    incremental twin of the batch job's bucket-manifest resume. `dedup_within`
    enables cross-batch re-delivery dedup (see `read_image_stream`).

    `seen_artifacts` (a `dedup.SeenCorpusArtifacts`) adds CORPUS-level caption
    content dedup — the continuously-running-crawl shape: every micro-batch is
    checked against the persisted seen corpus (exact fingerprint + MinHash
    near-dup, O(batch) via `dedup_incremental`) and against itself; losers
    drop with reason 'corpus_duplicate'; survivors' captions are appended back
    to the artifacts AFTER the batch's output commits, keyed by (checkpoint
    identity, streaming batch id) via `append_once` so an at-least-once replay
    of the batch never double-appends, a crashed half-append is excluded from
    the replay's own verdicts (`exclude_token`), and two streams sharing one
    corpus never mistake each other's batch numbering. Batch N+1 therefore
    dedups against batch N without ever re-reading batch N's text — the
    artifact tables are the only cross-batch state, and they grow
    O(kept rows)."""
    cfg = cfg or FilterConfig()
    totals = {"batches": 0, "rows_in": 0, "rows_kept": 0}
    # artifact idempotency tokens are (checkpoint IDENTITY, batch id): batch
    # ids restart at 0 for every new checkpoint, so a bare id would collide
    # across streams sharing one corpus. Identity = the streaming query id
    # Spark writes to <checkpoint>/stream/metadata at query creation — stable
    # across restarts of the same checkpoint, fresh when the checkpoint is
    # wiped and recreated. A path hash would NOT be: wipe-and-recreate at the
    # same path keeps the key while batch ids restart at 0, so every early
    # batch of the new run reads as an already-applied replay and is silently
    # skipped. Two hosts with identical local paths sharing one corpus
    # collide the same way; UUIDs never do.
    _key_cache: dict[str, str] = {}

    def _ckpt_key() -> str:
        key = _key_cache.get("key")
        if key is None:
            import json

            meta_path = os.path.join(checkpoint_dir, "stream", "metadata")
            try:
                with open(meta_path) as fh:
                    key = str(json.load(fh)["id"])
            except Exception as exc:  # no silent path-hash fallback: it
                # reintroduces the wipe-and-recreate collision invisibly
                raise RuntimeError(
                    f"cannot read the streaming query id from {meta_path} — "
                    "needed to key seen-corpus idempotency tokens"
                ) from exc
            _key_cache["key"] = key
        return key

    def _token(batch_id: int) -> str:
        return f"{_ckpt_key()}-b{int(batch_id)}"

    _snap_cell: dict = {}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from data_quality_check_spark.operators.dedup import (
            _release_local_checkpoint,
            pin_scope,
        )

        # dedup_incremental pins its signature tables; scope them to this
        # micro-batch so a long-lived stream releases storage per batch
        # instead of accumulating pins for the query's lifetime — and release
        # the batch's scored snapshot the same way, crash or not
        with pin_scope():
            try:
                _process_batch(batch_df, batch_id)
            finally:
                snap = _snap_cell.pop("snap", None)
                if snap is not None:
                    _release_local_checkpoint(snap)

    def _process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if seen_artifacts is not None and seen_artifacts.token_applied(
            _token(batch_id)
        ):
            # the artifact append is the LAST side effect of a batch, so a
            # recorded token means output + metrics + append all committed and
            # only the streaming offset commit was lost. Reprocessing would be
            # WRONG, not just wasteful: the batch's own captions are in the
            # corpus now, so a recomputed verdict would drop every row as its
            # own corpus_duplicate. Replay = restore totals from the committed
            # metrics row and do nothing else.
            try:
                rows = (
                    spark.read.parquet(
                        os.path.join(checkpoint_dir, "stream_run_metrics")
                    )
                    .filter(F.col("batch_id") == int(batch_id))
                    .select("rows_in", "rows_kept")
                    .collect()
                )
            except Exception:
                # a missing/unreadable metrics DIRECTORY is the same
                # divergence as a missing row — surface the safety
                # explanation, not a raw PATH_NOT_FOUND
                rows = []
            if not rows:
                raise RuntimeError(
                    f"batch {batch_id} is recorded as applied in the seen "
                    "corpus but its stream_run_metrics row is missing — the "
                    "metrics table and the checkpoint have diverged (was the "
                    "metrics directory deleted?); reprocessing is NOT safe "
                    "(the batch's captions are in the corpus already)"
                )
            m = rows[0]
            totals["batches"] += 1
            totals["rows_in"] += int(m["rows_in"])
            totals["rows_kept"] += int(m["rows_kept"])
            return
        df = batch_df
        if "_bucket" not in df.columns:
            df = df.withColumn("_bucket", bucket_col(num_buckets=cfg.num_buckets))
        df = with_rid(df)
        # batch-scope (see module docstring); finalize joins decision tables
        # AS GIVEN, so gate the broadcast hint here like the batch job does —
        # the pin releases with this batch's pin_scope
        from data_quality_check_spark.operators.dedup import _pin

        dups = _pin(dup_decisions(df, max_broadcast=cfg.max_broadcast_decisions))
        if dups.count() <= cfg.max_broadcast_decisions:
            dups = F.broadcast(dups)
        # the batch job computes contamination once over the full input; the
        # stream's unit of input IS the micro-batch, so per-batch here — same
        # FilterConfig options must mean the same verdicts in both jobs
        contaminated = contamination_decisions(spark, df, cfg)
        scored = finalize(score_rows(df, cfg), cfg, dups, contaminated)
        if seen_artifacts is not None:
            from data_quality_check_spark.operators.dedup import dedup_incremental

            # corpus dedup competes ONLY among rows the filter would PUBLISH
            # (row_selected) — not the raw batch: a non-emitted duplicate
            # copy's caption must not veto its image_id, and a within-batch
            # near-dup loser must not drop as corpus_duplicate when its winner
            # row is itself dropped for quality (the caption would then reach
            # neither the output nor the corpus). Snapshot the scored batch
            # eagerly first: `dec` is derived from it AND joined back onto it,
            # so a lazy plan would evaluate the scoring twice — and this
            # batch's later artifact appends must not shift what dec's
            # lineage reads. exclude_token makes a retry of THIS batch blind
            # to its own crashed attempt's partial appends. The decision
            # table is batch-sized — broadcast it onto the scored rows and
            # fold the verdict into keep/drop_reason BEFORE the metrics
            # observe, so corpus drops are first-class in the metric row.
            scored_snap = scored.localCheckpoint(eager=True)
            _snap_cell["snap"] = scored_snap
            scored = scored_snap
            dec = (
                dedup_incremental(
                    scored.filter(F.col("row_selected")).select("image_id", "caption"),
                    None,
                    "image_id",
                    "caption",
                    threshold=content_dedup_threshold,
                    ngram=seen_artifacts.ngram,
                    num_hashes=seen_artifacts.num_hashes,
                    bands=seen_artifacts.bands,
                    seen_artifacts=seen_artifacts,
                    exclude_token=_token(batch_id),
                )
                # one physical row per selected image_id already; bool_and is
                # belt-and-braces against a caller-side duplicate-id slip
                .groupBy("image_id")
                .agg(F.bool_and("keep").alias("_corpus_keep"))
            )
            scored = scored.join(F.broadcast(dec), "image_id", "left")
            # rows outside the decision table (not row_selected, or null
            # caption → no fingerprint) keep their existing verdict: a NULL
            # _corpus_keep must never flip them
            corpus_dup = ~F.coalesce(F.col("_corpus_keep"), F.lit(True))
            scored = (
                scored.withColumn(
                    "drop_reason",
                    F.when(
                        F.col("keep") & corpus_dup, F.lit("corpus_duplicate")
                    ).otherwise(F.col("drop_reason")),
                )
                .withColumn("keep", F.col("keep") & ~corpus_dup)
                .withColumn("row_selected", F.col("row_selected") & ~corpus_dup)
                .drop("_corpus_keep")
            )
        # AFTER the corpus overlay: n_scrubbed must count kept-and-scrubbed
        # rows, not rows later dropped as corpus duplicates
        scored = scored.withColumn(
            "_scrub_changed",
            F.col("row_selected")
            & ~F.col("scrubbed_caption").eqNullSafe(trim_col(F.col("caption"))),
        )
        out_cols = list(OUT_COLS)
        # SAME code object as the batch job's optional projections
        # (run.optional_out_cols) — the two jobs' output schemas cannot drift
        from data_quality_check_spark.pipeline.run import optional_out_cols

        scored = optional_out_cols(scored, cfg, out_cols)
        obs = Observation(f"stream-metrics-{cfg.run_id}-{batch_id}")
        # the batch job's metric aggs with no per-bucket terms — SAME code
        # object (run._bucket_metric_aggs), so the two jobs' metric schemas
        # cannot drift
        scored = scored.observe(obs, *_bucket_metric_aggs([], cfg.split_labels()))
        kept = scored.filter(F.col("row_selected")).select(*out_cols)
        kept = kept.repartition(cfg.num_buckets, F.col("_bucket"))
        # IDEMPOTENT write: foreachBatch is at-least-once (a batch whose write
        # committed but whose offsets didn't is re-run on restart), so kept
        # rows land under a _batch_id partition with dynamic-partition
        # OVERWRITE — a replay rewrites exactly its own partitions instead of
        # appending duplicates. Readers still prune on the nested _bucket dirs.
        # NOT `spark = ...`: an assignment would shadow the closure's session
        # for the WHOLE function body (the replay guard above reads it first)
        sess_conf = kept.sparkSession.conf
        # scoped like excludedRules below: restored after the write so the
        # dynamic mode never leaks into the caller's own overwrite writes
        prev_pom = sess_conf.get("spark.sql.sources.partitionOverwriteMode", None)
        sess_conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # an ALL-DROPPED batch makes the observed plan's kept side empty at
        # runtime; AQE's AQEPropagateEmptyRelation then replaces the subtree
        # and the CollectMetrics row is never delivered — obs.get fails on an
        # empty observation (the snapshot's known partition stats make the
        # emptiness visible to AQE; bench_hamming.py hits the same behavior).
        # Exclude that single rule around this write; AQE itself stays on.
        _EMPTY_RULE = (
            "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
        )
        prev_excluded = sess_conf.get("spark.sql.adaptive.optimizer.excludedRules", None)
        sess_conf.set(
            "spark.sql.adaptive.optimizer.excludedRules",
            _EMPTY_RULE if not prev_excluded else f"{prev_excluded},{_EMPTY_RULE}",
        )
        try:
            (
                kept.withColumn("_batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("_batch_id", "_bucket")
                .option("compression", "uncompressed")
                .option("parquet.enable.dictionary", "false")
                .parquet(os.path.join(output_dir, "filtered"))
            )
        finally:
            if prev_excluded is None:
                sess_conf.unset("spark.sql.adaptive.optimizer.excludedRules")
            else:
                sess_conf.set(
                    "spark.sql.adaptive.optimizer.excludedRules", prev_excluded
                )
            if prev_pom is None:
                sess_conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                sess_conf.set("spark.sql.sources.partitionOverwriteMode", prev_pom)
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
        # own table (NOT the batch job's run_metrics — its rows carry no
        # batch_id, and one directory with two schemas reads back
        # footer-dependently); deterministic per-batch filename → a replayed
        # batch REPLACES its metrics row instead of double-counting
        _append_parquet(
            pdf,
            os.path.join(checkpoint_dir, "stream_run_metrics"),
            cfg.run_id,
            fname=f"batch-{int(batch_id):010d}.parquet",
        )
        totals["batches"] += 1
        totals["rows_in"] += int(m["rows_in"])
        totals["rows_kept"] += int(m["rows_kept"])
        if seen_artifacts is not None:
            # fold this batch's survivors into the seen corpus — read them back
            # from the COMMITTED output partition (cheap narrow scan of what
            # actually landed; re-evaluating `kept`'s lineage here would re-run
            # the scoring plan against artifact tables mid-append). Token =
            # (checkpoint, batch id): stable across restarts of this
            # checkpoint, so an at-least-once replay skips the append
            # (append_once) — and the token must be recorded even for an
            # all-dropped batch, whose output dir may hold no readable files.
            if int(m["rows_kept"]) > 0:
                committed = (
                    spark.read.parquet(os.path.join(output_dir, "filtered"))
                    .filter(F.col("_batch_id") == int(batch_id))
                    .select("image_id", "caption")
                )
            else:
                committed = spark.createDataFrame(
                    [], "image_id string, caption string"
                )
            # assume_new: this batch's entry guard already read the applied
            # table and proved the token absent — don't pay that read twice
            seen_artifacts.append_once(
                committed, "image_id", "caption", token=_token(batch_id), assume_new=True
            )

    stream = read_image_stream(spark, input_path, max_files_per_trigger, dedup_within)
    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "stream"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return totals
