"""Derived gate tables for queries whose semantics the raw fixtures can't
exercise (VERDICT r2 item 1).

The driver's `embeddings` table is near-isotropic (measured: median pairwise
cosine 0.0, max 0.6 at sf0.1), so a production near-dup threshold (τ ≥ 0.9)
finds nothing on it and the round-2 gate had to run at τ=0.35 — a threshold
sign-random-projection LSH fundamentally cannot prune at (per-bit collision
0.61 vs 0.50 random: no separation). This module derives a PLANTED gate table:
the raw embeddings plus, for every 10th vector, a deterministically perturbed
copy at cosine ≈ 0.9987 — so the LSH gate queries demonstrate the production
threshold with a non-trivial expected answer (exactly the planted pairs).

Cross-engine exactness: the Spark construction (JVM `transform` expressions)
and the pandas twin below must produce BIT-IDENTICAL float64 vectors, because
the oracle computes SRP signatures from the twin's output. Every step is an
exactly-reproducible IEEE op:

  * float32 → float64 cast: exact;
  * k = (vec_id·31 + i·7) mod 11 − 5: pure int64 arithmetic, exact;
  * double(k): exact (|k| ≤ 5);
  * k · 0.002: ONE correctly-rounded multiply of identical doubles;
  * x + δ: ONE correctly-rounded add.

Both engines perform the same two rounded ops on the same inputs, so the
results agree to the last bit (pinned by
tests/test_dedup_similarity.py::test_planted_embeddings_parity).

Perturbation size: |δ_i| ≤ 0.01 on unit-norm 64-dim vectors → ‖δ‖ ≈ 0.05 →
cosine(base, planted) ≈ 0.9987, comfortably above τ=0.9 while every
non-planted pair stays below 0.61 — the gate's expected answer is exactly the
planted pair set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

PLANT_EVERY = 10  # every 10th vec_id gets a perturbed near-dup copy
PLANT_ID_OFFSET = 1_000_000  # planted copy id = base id + offset
_DELTA_SCALE = 0.002  # k ∈ [-5, 5] → |δ| ≤ 0.01 per element


def planted_embeddings_df(emb: DataFrame) -> DataFrame:
    """Spark construction: (vec_id, embedding array<double>) = raw embeddings
    ∪ perturbed copies of every PLANT_EVERY-th vector. Pure JVM expressions —
    no UDF, no shuffle beyond the union."""
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    vid = F.col("vec_id")
    planted = (
        emb.filter(vid % PLANT_EVERY == 0)
        .select(
            "vec_id",
            F.transform(
                F.col("embedding"),
                lambda x, i: x.cast("double")
                + ((vid * 31 + i * 7) % 11 - 5).cast("double") * F.lit(_DELTA_SCALE),
            ).alias("embedding"),
        )
        .select((vid + PLANT_ID_OFFSET).alias("vec_id"), "embedding")
    )
    return base.unionByName(planted)


def planted_embeddings_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pandas/numpy twin of `planted_embeddings_df` — identical IEEE arithmetic
    (see module docstring), used by the DuckDB oracle to derive the same gate
    table driver-side. Input: (vec_id, embedding) as read from the parquet."""
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    sel = ids % PLANT_EVERY == 0
    bids = ids[sel]
    i_idx = np.arange(x.shape[1], dtype=np.int64)
    k = (bids[:, None] * 31 + i_idx[None, :] * 7) % 11 - 5
    planted = x[sel] + k.astype(np.float64) * _DELTA_SCALE
    out_ids = np.concatenate([ids, bids + PLANT_ID_OFFSET])
    out_vecs = [row.tolist() for row in x] + [row.tolist() for row in planted]
    return pd.DataFrame({"vec_id": out_ids, "embedding": out_vecs})


# ── Synthetic image-metadata gate table (the north rule's image axis) ──
#
# The driver fixtures carry no image table, and the brief mandates a
# deterministic small-scale synthesis ("input_hint": image_id/bytes/w/h/fmt/
# caption/phash). The flag logic only ever touches length(bytes) — by design
# (pipeline/heuristics.py `with_flags` never ships pixel bytes through a
# shuffle) — so the gate table carries `byte_len` directly and stays pure
# int64 arithmetic over doc_id, expressible identically in Spark Columns and
# DuckDB SQL (nonnegative operands, so `%` agrees; integer division is
# Spark `DIV` ≡ DuckDB `//`). Injection rates: ~1/97 degenerate dims, ~1/89
# truncated files, ~1/83 oversized files, 2/5 disallowed containers.

IMG_FMTS = ("png", "jpeg", "webp", "gif", "bmp")


def _meta_exprs(div_op: str) -> dict[str, str]:
    """The shared int64 arithmetic, as SQL expression strings. `div_op` is the
    only dialect difference: integer division is `DIV` in Spark SQL, `//` in
    DuckDB; `%` and CASE agree (operands are all nonnegative)."""
    w = "(16 + (doc_id * 7919) % 2040)"
    h = "(CASE WHEN doc_id % 97 = 0 THEN 4 ELSE 16 + (doc_id * 104729) % 2040 END)"
    raw = f"({w} * {h} * 3)"
    byte_len = (
        f"(CASE WHEN doc_id % 89 = 0 THEN 8"
        f" WHEN doc_id % 83 = 0 THEN {raw} + 4096"
        f" ELSE 100 + {raw} {div_op} (2 + doc_id % 23) END)"
    )
    return {"w": w, "h": h, "byte_len": byte_len}


def synthetic_image_meta_df(docs: DataFrame) -> DataFrame:
    """Spark construction: one image-metadata row per document. Single
    codegen'd projection over the documents scan — no UDF, no shuffle."""
    e = _meta_exprs("DIV")
    fmt = F.element_at(
        F.array(*[F.lit(v) for v in IMG_FMTS]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("image_id"),
        F.expr(e["w"]).cast("int").alias("w"),
        F.expr(e["h"]).cast("int").alias("h"),
        fmt.alias("fmt"),
        F.expr(e["byte_len"]).cast("long").alias("byte_len"),
        F.col("text").alias("caption"),
    )


def synthetic_image_meta_sql(docs_rel: str = "documents") -> str:
    """DuckDB twin: identical arithmetic as a plain SELECT over documents."""
    e = _meta_exprs("//")
    fmts = ", ".join(f"'{v}'" for v in IMG_FMTS)
    return (
        f"SELECT doc_id AS image_id, CAST({e['w']} AS INT) AS w,"
        f" CAST({e['h']} AS INT) AS h,"
        f" ([{fmts}])[CAST(doc_id % 5 + 1 AS INT)] AS fmt,"
        f" CAST({e['byte_len']} AS BIGINT) AS byte_len, text AS caption"
        f" FROM {docs_rel}"
    )
