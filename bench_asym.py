"""Scale measurement for containment_pairs_asym's rare-prefix probe route
(VERDICT r4 task 1): demonstrate, on ~10⁵ synthetic documents with planted
short-in-long quotes at size ratio ρ ≈ 29, that

 1. the candidate stage is sub-quadratic (measured fraction of all pairs),
 2. recall on the planted extreme-asymmetry pairs is EXACTLY 1.0 (the
    pigeonhole guarantee, not a tuning outcome), and
 3. the banded MinHash path — the moderate-asymmetry operator — recalls
    almost none of the same pairs (its documented envelope: candidate recall
    ≈ 1−(1−s³)⁴² at s = cρ/(1+ρ−cρ) ≈ 0.03 here), which is the measured gap
    the asym route exists to close.

Corpus: N hosts of 60 pseudo-random words from a 50k vocabulary (3-gram
shingles ⇒ ~58 shingles/host, essentially disjoint across hosts), plus one
planted short per 16 hosts = the host's first 4 words (2 shingles, a strict
subset ⇒ containment exactly 1.0, ρ = 58/2 = 29). Everything is generated
INSIDE Spark (spark.range + hash expressions) — no driver-side rows.

Run:  python bench_asym.py            (~2-4 min on local[32])
Env:  SPARK_GRAFT_ASYM_N (default 100_000 hosts), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

N = int(os.environ.get("SPARK_GRAFT_ASYM_N", 100_000))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
PLANT_MOD = 16  # one planted short per 16 hosts
SHORT_WORDS = 4  # 2 trigram shingles; hosts have 58 -> rho = 29
THRESHOLD = 0.9


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def corpus(spark):
    """(doc_id, text): N hosts + N/PLANT_MOD planted word-safe short prefixes."""
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(50_000)),
            ),
        ),
    )
    hosts = spark.range(N).select(F.col("id").alias("doc_id"), words.alias("text"))
    shorts = (
        hosts.filter(F.col("doc_id") % PLANT_MOD == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, SHORT_WORDS), " "
            ).alias("text"),
        )
    )
    return hosts.unionByName(shorts)


def main() -> None:
    from data_quality_check_spark.operators import dedup as DD
    from data_quality_check_spark.session import get_spark

    spark = get_spark(
        app_name="dqcs-bench-asym",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = corpus(spark).localCheckpoint(eager=True)  # freeze the synthetic corpus
    n_total = df.count()
    n_plants = N // PLANT_MOD
    all_pairs = n_total * (n_total - 1) / 2

    # 1+2: the asym route, executed — wall, candidates, planted recall
    DD.candidate_counts()  # reset observer
    t0 = time.perf_counter()
    pairs = DD.containment_pairs_asym(
        df, "doc_id", "text", THRESHOLD, ngram=3, min_size_ratio=10.0
    )
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in pairs.collect()}
    asym_wall = round(time.perf_counter() - t0, 2)
    cand = DD.candidate_counts().get("containment_asym", 0)
    DD.release_pins()
    planted = {(i, 1_000_000 + i) for i in range(0, N, PLANT_MOD)}
    asym_hits = planted & set(got)
    assert all(got[p] == 1.0 for p in asym_hits)  # strict-subset plants

    # 3: the banded path's recall on the SAME pairs (its documented blindness)
    t0 = time.perf_counter()
    banded = set(
        (r["id_a"], r["id_b"])
        for r in DD.containment_pairs_banded(
            df, "doc_id", "text", THRESHOLD, ngram=3
        ).collect()
    )
    banded_wall = round(time.perf_counter() - t0, 2)
    DD.release_pins()
    spark.stop()

    out = {
        "metric": "containment_asym_scale",
        "n_docs": n_total,
        "n_planted": n_plants,
        "size_ratio": 29,
        "threshold": THRESHOLD,
        "asym": {
            "wall_sec": asym_wall,
            "candidates": int(cand),
            "candidate_fraction": round(cand / all_pairs, 8),
            "planted_recall": round(len(asym_hits) / n_plants, 4),
            "pairs_emitted": len(got),
        },
        "banded": {
            "wall_sec": banded_wall,
            "planted_recall": round(len(banded & planted) / n_plants, 4),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
