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
# planted copy id = base id + offset; 2^40 keeps planted ids disjoint from any
# realistic vec_id range (a 1e6 offset would collide at a 1M-row fixture) while
# vec_id·31 in the perturbation stays far inside int64
PLANT_ID_OFFSET = 1 << 40
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


# ── deterministic 60-bit perceptual hash with PLANTED near-duplicates ──
# Four 15-bit chunks, each (doc_id·prime) mod a DISTINCT 15-bit prime —
# distinct moduli so the combined period is lcm ≈ 1.1×10^18 and no two ids in
# any realistic fixture share a hash; random pairs land within Hamming 3 with
# p ≈ 36k/2^60 ≈ 0 (verified: zero accidental pairs at 60k ids). Products
# stay ≤ ~10^12, far inside int64 — DuckDB raises on BIGINT overflow, Spark
# wraps, so every intermediate must be overflow-free in BOTH. Every 10th
# image carries the PREVIOUS image's hash with a contiguous run of 1-3 bits
# flipped — a planted near-dup at Hamming ≤ 3, so the phash gate query's
# exact expected answer is precisely the planted pair set (the text-SimHash
# analogue of the planted embeddings above).
_PH_CHUNKS = ((7919, 32749), (104729, 32717), (1299709, 32713), (15485863, 32707))
PHASH_PLANT_EVERY = 10


def _phash_base(d: str) -> str:
    return (
        "("
        + " + ".join(
            f"(({d} * {p}) % {m}) * {1 << (15 * i)}"
            for i, (p, m) in enumerate(_PH_CHUNKS)
        )
        + ")"
    )


def phash_expr(dialect: str) -> str:
    """The phash column as SQL text; `dialect` ∈ {'spark', 'duckdb'} switches
    the two non-shared spellings (XOR and left-shift on int64)."""
    m = f"(doc_id % 3 + 1)"  # bits flipped: 1..3
    p = "(doc_id % 57)"  # flip position: run stays inside the 60 bits
    if dialect == "spark":
        mask = f"shiftleft(shiftleft(CAST(1 AS BIGINT), {m}) - 1, {p})"
        flipped = f"({_phash_base('(doc_id - 1)')} ^ {mask})"
    else:
        mask = f"(((CAST(1 AS BIGINT) << {m}) - 1) << {p})"
        flipped = f"xor({_phash_base('(doc_id - 1)')}, {mask})"
    return (
        f"(CASE WHEN doc_id % {PHASH_PLANT_EVERY} = 0 AND doc_id > 0 "
        f"THEN {flipped} ELSE {_phash_base('doc_id')} END)"
    )


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
        F.expr(phash_expr("spark")).cast("long").alias("phash"),
    )


def synthetic_image_meta_sql(docs_rel: str = "documents") -> str:
    """DuckDB twin: identical arithmetic as a plain SELECT over documents."""
    e = _meta_exprs("//")
    fmts = ", ".join(f"'{v}'" for v in IMG_FMTS)
    return (
        f"SELECT doc_id AS image_id, CAST({e['w']} AS INT) AS w,"
        f" CAST({e['h']} AS INT) AS h,"
        f" ([{fmts}])[CAST(doc_id % 5 + 1 AS INT)] AS fmt,"
        f" CAST({e['byte_len']} AS BIGINT) AS byte_len, text AS caption,"
        f" CAST({phash_expr('duckdb')} AS BIGINT) AS phash"
        f" FROM {docs_rel}"
    )


# ── Synthetic image-BYTES gate table (decode → embed → near-dup, end-to-end) ──
#
# The metadata gate table above deliberately never materializes pixels; the
# image-EMBEDDING near-dup query needs real encoded payloads so the full
# decode → grid-luma-feature → SRP-LSH chain runs through the same Arrow UDFs
# production would use. Deterministic construction per image_id (= doc_id):
#
#   * 16 md5-derived bits choose a 4×4 bright/dark block pattern (200 vs 40),
#     plus a fixed per-pixel texture — block patterns are i.i.d.-like across
#     ids, so the centered grid-luma features of DISTINCT images sit near
#     cosine 0 (measured p50 0.008) while every planted copy sits ≥ 0.9999;
#   * every IMG_BYTES_EVERY-th image is the PREVIOUS image's pixels re-encoded
#     as 'jpeg' (the codec family's lossy member) — a realistic re-compressed
#     duplicate whose decode differs by ≤ the quantization step;
#   * base images cycle 'png'/'bmp'/'jpeg' containers by id.
#
# `image_payload` is the SINGLE kernel shared by the Spark mapInPandas builder
# and the DuckDB oracle twin (oracles.image_embedding_neardup_sql): both
# engines synthesize byte-identical payloads, so features/signatures agree
# exactly (same policy as srp_band_chunks / grid_luma_features).

IMG_BYTES_EVERY = 10
IMG_BYTES_H, IMG_BYTES_W = 16, 24
IMG_FEATURE_GRID = 4  # 4×4 blocks = 16-dim feature, matches feature_vector_udf
_IMG_BYTES_FMTS = ("png", "bmp", "jpeg")


def _image_bits(base: int, grid: int = IMG_FEATURE_GRID) -> "list[int]":
    """grid² well-mixed deterministic bits per base id (md5 — a linear
    multiplicative mixer leaves bit-13 patterns correlated across consecutive
    ids and floods the gate with accidental near-identical patterns)."""
    import hashlib

    nbits = grid * grid
    v = int.from_bytes(
        hashlib.md5(str(base).encode()).digest()[: (nbits + 7) // 8], "big"
    )
    return [(v >> k) & 1 for k in range(nbits)]


def image_payload(image_id: int, grid: int = IMG_FEATURE_GRID) -> "tuple[bytes, str]":
    """Encoded (bytes, fmt) for one image id — the shared synthesis kernel.

    `grid` sets the block-pattern entropy (2^grid² distinct patterns) and must
    match the feature grid downstream. The default 4×4 (2¹⁶ patterns) is sized
    for GATE-scale tables (≤ ~10⁴ rows): past ~10⁵ images the birthday-paradox
    mid-cosine tail saturates and the banded join degenerates toward all-pairs
    — real image embeddings are higher-dimensional, so scale measurements use
    grid=8 (64-dim features, 2⁶⁴ patterns; see BENCH.md)."""
    from data_quality_check_spark.pipeline import codecs

    every, h, w, g = IMG_BYTES_EVERY, IMG_BYTES_H, IMG_BYTES_W, grid
    base = image_id - 1 if (image_id % every == every - 1 and image_id > 0) else image_id
    bm = np.array(_image_bits(base, g), dtype=np.int64).reshape(g, g)
    valmap = np.where(
        bm.repeat(h // g, 0).repeat(w // g, 1)[:, :, None] == 1, 200, 40
    )
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    tex = (y * 7 + x * 13 + c * 5) % 17 - 8
    px = np.clip(valmap + tex, 0, 255).astype(np.uint8)
    fmt = "jpeg" if image_id != base else _IMG_BYTES_FMTS[base % 3]
    return codecs.encode(px, fmt), fmt


def synthetic_image_bytes_df(docs: DataFrame, grid: int = IMG_FEATURE_GRID) -> DataFrame:
    """Spark construction: (image_id, bytes, fmt), one image per doc_id, via
    an Arrow-batched mapInPandas over the shared `image_payload` kernel. At
    production scale this stands in for the Iceberg image table scan — the
    synthesis is map-side-only, so the plan downstream of it (features, LSH)
    is exactly the plan a real table would feed."""
    import pandas as _pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = [image_payload(int(i), grid) for i in ids]
            yield _pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": [p[0] for p in payloads],
                    "fmt": [p[1] for p in payloads],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, "image_id long, bytes binary, fmt string"
    )


def centered_image_embeddings(imgs: DataFrame, grid: int = IMG_FEATURE_GRID) -> DataFrame:
    """(vec_id, embedding array<double>) from an (image_id, bytes) frame:
    decode → grid-luma features (production Arrow UDF) → `x − 0.5` centering.
    Centering is what lets SRP banding prune: raw luma features are
    non-negative (every pair lands near cosine 1), centered ones put distinct
    block patterns near cosine 0. ONE definition used by the registered
    `image_embedding_neardup` query AND its tests, so the tested chain cannot
    drift from the production chain (the oracle twin replays the same steps
    driver-side in oracles.image_embedding_neardup_sql)."""
    from data_quality_check_spark.functions.multimodal import feature_vector_udf

    feats = imgs.select(
        "image_id", feature_vector_udf(grid)(F.col("bytes")).alias("_f")
    )
    return feats.select(
        F.col("image_id").alias("vec_id"),
        F.transform("_f", lambda x: x.cast("double") - F.lit(0.5)).alias("embedding"),
    )


def synthetic_image_bytes_pdf(ids: np.ndarray, grid: int = IMG_FEATURE_GRID) -> pd.DataFrame:
    """Driver-side twin of `synthetic_image_bytes_df` (same kernel, same
    columns) for the DuckDB oracle."""
    payloads = [image_payload(int(i), grid) for i in ids]
    return pd.DataFrame(
        {
            "image_id": np.asarray(ids, dtype=np.int64),
            "bytes": [p[0] for p in payloads],
            "fmt": [p[1] for p in payloads],
        }
    )
