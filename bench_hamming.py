"""Scale measurement for hamming_near_pairs' two-level pigeonhole escalation
(VERDICT r3 task 6): demonstrate the docstring's candidate arithmetic
(dedup.py hamming_near_pairs) on ≥10⁷ synthetic 64-bit signatures, with and
without `bucket_cap`, and record the measured fractions in BENCH.md.

Three measurements, one JSON line at the end:

 1. `uniform_one_level` — 10⁷ xxhash64 signatures, bucket_cap=None, EXECUTED:
    the observe()d candidate count vs the docstring's random-pair arithmetic
    (k+1)·C(n,2)/2^16 ≈ 3.05e9 at n=10⁷, k=3. This is the regime the docstring
    calls the one-level ceiling ("only sub-quadratic up to n ≈ 10⁶-10⁷").
 2. `adversarial_one_level` — same n but 20% of rows share one of 64 hot
    low-16-bit keys (the common-chunk shape real corpora produce: boilerplate
    phashes, common text patterns). Counted EXACTLY via the banding identity
    Σ_buckets C(|bucket|,2) — deliberately NOT executed: the count (~3.4e10)
    is the blow-up the escalation exists to avoid.
 3. `adversarial_escalated` — the same adversarial table EXECUTED with
    bucket_cap: hot buckets re-band their complement bits, candidates fall
    back to ~the uniform floor, and 50 planted ≤3-bit pairs all come back
    (recall stays exactly 1 through the escalation).

Run:  python bench_hamming.py            (~4-6 min on local[32])
Env:  SPARK_GRAFT_HAMMING_N (default 10_000_000), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

N = int(os.environ.get("SPARK_GRAFT_HAMMING_N", 10_000_000))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
K = 3  # max_hamming: 4 chunks of 16 bits
CAP = 10_000
HOT_KEYS = 64  # distinct low-16-bit values shared by the hot fraction
HOT_MOD = 5  # 1/5 of rows are hot
N_PLANT = 50


def c2(x: float) -> float:
    return x * (x - 1) / 2.0


def base_signatures(spark, adversarial: bool):
    """xxhash64 signatures; adversarial mode forces id%HOT_MOD==0 rows' low 16
    bits into one of HOT_KEYS values (distinct, spread over the keyspace)."""
    df = spark.range(N).select("id", F.xxhash64("id").alias("sig"))
    if not adversarial:
        return df
    hot_key = (F.col("id") % F.lit(HOT_KEYS)) * F.lit(1021) % F.lit(65536)
    sig = F.when(
        F.col("id") % HOT_MOD == 0,
        F.col("sig").bitwiseAND(F.lit(~0xFFFF)).bitwiseOR(hot_key),
    ).otherwise(F.col("sig"))
    return df.select("id", sig.alias("sig"))


def plant_pairs(df):
    """Append N_PLANT rows whose signature is an existing row's with ≤3 bits
    flipped — the recall-1 ground truth through the escalation."""
    seeds = [j * 997 for j in range(N_PLANT)]  # mix of hot and uniform rows
    # F.shiftleft needs a literal bit count; per-row positions go through expr
    flips = F.expr(
        "shiftleft(1L, cast(id % 64 as int)) | "
        "shiftleft(1L, cast((id * 7 + 13) % 64 as int)) | "
        "shiftleft(1L, cast((id * 11 + 29) % 64 as int))"
    )
    planted = df.filter(F.col("id").isin(seeds)).select(
        (F.col("id") + F.lit(N)).alias("id"),
        F.col("sig").bitwiseXOR(flips).alias("sig"),
    )
    return df.unionByName(planted), {(s, s + N) for s in seeds}


def one_level_identity(df) -> int:
    """Exact candidate count of the one-level banded self-join WITHOUT
    executing it: Σ over (chunk, ckey) buckets of C(|bucket|, 2) — the same
    number hamming_near_pairs(bucket_cap=None) would observe()."""
    chunks = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("sig"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ckey"),
                    )
                    for i in range(K + 1)
                ]
            )
        ).alias("cc")
    ).select("cc.*")
    return int(
        chunks.groupBy("chunk", "ckey")
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")))
        .collect()[0][0]
    )


def executed_candidates(df, bucket_cap):
    """Run the real operator; return (n_pairs, pair_set_sample, candidates, sec)."""
    from data_quality_check_spark.operators import dedup as DD

    t0 = time.time()
    pairs = DD.hamming_near_pairs(
        df, id_col="id", sig_col="sig", max_hamming=K, bucket_cap=bucket_cap
    )
    rows = pairs.collect()
    sec = time.time() - t0
    # observation metrics arrive via an async listener; poll briefly rather
    # than racing it (candidate_counts itself is non-blocking by contract)
    cand = None
    for _ in range(40):
        cand = DD.candidate_counts(reset=False).get("hamming_near_pairs")
        if cand is not None:
            break
        time.sleep(0.25)
    DD.candidate_counts()  # reset
    DD.release_pins()
    return rows, cand, sec


def main() -> None:
    from data_quality_check_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            # the uniform run returns ZERO pairs; AQE's empty-relation
            # propagation then re-plans the tail and drops the observed-metrics
            # row (delivered empty — see candidate_counts docstring). This
            # harness exists to measure the candidate count, so exclude that
            # one rule here (AQE itself stays on); the library keeps it.
            "spark.sql.adaptive.optimizer.excludedRules": (
                "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n": N, "k": K, "cap": CAP, "hot_keys": HOT_KEYS, "hot_frac": 1 / HOT_MOD}

    # ── 1. uniform, one-level, executed ──
    uni = base_signatures(spark, adversarial=False)
    pred_uniform = (K + 1) * c2(N) / 2 ** 16
    rows, cand, sec = executed_candidates(uni, bucket_cap=None)
    out["uniform_one_level"] = {
        "predicted": int(pred_uniform),
        "observed": cand,
        "ratio": round(cand / pred_uniform, 4) if cand else None,
        "pairs_found": len(rows),
        "sec": round(sec, 1),
    }

    # ── 2. adversarial, one-level: exact identity, not executed ──
    adv, truth = plant_pairs(base_signatures(spark, adversarial=True))
    n_hot_bucket = N / HOT_MOD / HOT_KEYS
    # chunk 0: HOT_KEYS hot buckets (hot rows + the uniform rows that land on
    # the same key) + the rest uniform; chunks 1-3 fully uniform
    n_uni = N * (1 - 1 / HOT_MOD)
    per_key_uniform = n_uni / 2 ** 16
    pred_adv = (
        K * c2(N) / 2 ** 16  # chunks 1..3
        + HOT_KEYS * c2(n_hot_bucket + per_key_uniform)  # hot buckets
        + (2 ** 16 - HOT_KEYS) * c2(per_key_uniform)  # chunk 0 remainder
    )
    t0 = time.time()
    ident_adv = one_level_identity(adv)
    out["adversarial_one_level"] = {
        "predicted": int(pred_adv),
        "identity_exact": ident_adv,
        "ratio": round(ident_adv / pred_adv, 4),
        "executed": False,
        "identity_sec": round(time.time() - t0, 1),
    }

    # ── 3. adversarial, escalated, executed ──
    # hot buckets re-band 48 complement bits into K+1 sub-chunks (~2^12 keys
    # each): per hot bucket ≈ (K+1) · |bucket|²/2 / 2^12 candidates
    sub_keys = 2 ** ((64 - 16) // (K + 1))
    hot_sz = n_hot_bucket + per_key_uniform
    pred_esc = (
        K * c2(N) / 2 ** 16
        + (2 ** 16 - HOT_KEYS) * c2(per_key_uniform)
        + HOT_KEYS * (K + 1) * (hot_sz ** 2 / 2) / sub_keys
    )
    rows, cand, sec = executed_candidates(adv, bucket_cap=CAP)
    got_pairs = {(r.id_a, r.id_b) for r in rows}
    out["adversarial_escalated"] = {
        "predicted": int(pred_esc),
        "observed": cand,
        "ratio": round(cand / pred_esc, 4) if cand else None,
        "pairs_found": len(rows),
        "planted": N_PLANT,
        "planted_recovered": len(truth & got_pairs),
        "sec": round(sec, 1),
    }
    if cand and ident_adv:
        out["escalation_candidate_reduction"] = round(ident_adv / cand, 1)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
