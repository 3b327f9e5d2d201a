"""Multimodal column plumbing: binary image payloads + typed metadata.

Images travel as opaque `binary` columns. Decode / feature-extraction runs inside
Arrow-batched pandas UDFs (`mapInPandas`-compatible shapes); the per-element codec
call is inherent to decoding (same as PIL/fastText in production). Real image
libraries are absent in this sandbox, so the codec is the deterministic in-repo
family (`pipeline/codecs.py`) with PIL auto-detected (`codecs.HAVE_PIL`) as the
production hook.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from data_quality_check_spark.pipeline import codecs

DECODE_SCHEMA = StructType(
    [
        StructField("decode_ok", BooleanType()),
        StructField("dec_w", IntegerType()),
        StructField("dec_h", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


@F.pandas_udf(DECODE_SCHEMA)
def decode_check_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """Decode validation + basic features per Arrow batch of encoded bytes."""
    for blobs in batches:
        ok, ws, hs, luma = [], [], [], []
        for b in blobs:
            arr = codecs.decode(b)
            if arr is None:
                ok.append(False)
                ws.append(None)
                hs.append(None)
                luma.append(None)
            else:
                ok.append(True)
                hs.append(int(arr.shape[0]))
                ws.append(int(arr.shape[1]))
                luma.append(float(arr.astype(np.float64).mean()))
        yield pd.DataFrame(
            {"decode_ok": ok, "dec_w": pd.array(ws, dtype="Int32"),
             "dec_h": pd.array(hs, dtype="Int32"), "mean_luma": luma}
        )


def with_decode_check(df: DataFrame, bytes_col: str = "bytes",
                      w_col: str = "w", h_col: str = "h") -> DataFrame:
    """Adds `flag_decode_failed`: undecodable bytes or decoded dims ≠ metadata.

    Map-side only — `bytes` is read, never shuffled.
    """
    # optimizer fence — pure UDF, but keeps Catalyst from cloning the decode
    # pass through pushed-down filters (see fused.py)
    dec = decode_check_udf.asNondeterministic()(F.col(bytes_col))
    df = df.withColumn("_dec", dec)
    mismatch = (F.col("_dec.dec_w") != F.col(w_col)) | (F.col("_dec.dec_h") != F.col(h_col))
    return df.withColumn(
        "flag_decode_failed",
        ~F.col("_dec.decode_ok") | F.coalesce(mismatch, F.lit(True)),
    ).drop("_dec")


def resize_udf(target: int = 8):
    """STUB-grade resize (nearest-neighbor via numpy) demonstrating the
    decode→transform→re-encode UDF shape; swap the body for PIL when available."""

    @F.pandas_udf("binary")
    def _resize(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for blobs in batches:
            out = []
            for b in blobs:
                arr = codecs.decode(b)
                if arr is None:
                    out.append(None)
                    continue
                h, w = arr.shape[:2]
                ys = (np.arange(target) * h // target).clip(0, h - 1)
                xs = (np.arange(target) * w // target).clip(0, w - 1)
                small = arr[np.ix_(ys, xs)]
                out.append(codecs.encode(small, "png"))
            yield pd.Series(out)

    return _resize
