"""Shared corpus-audit scaffolding (DataFrame-level, engine-twin-friendly).

Home of the per-family grouped audit shape used by both
`operators.encoding.encoding_audit` and `functions.scrub.pii_density` — a
neutral module so neither audit has to import the other's domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def grouped_marker_audit(
    df: DataFrame,
    group_col: str,
    counts: "list[tuple[str, Column]]",
    total_suffix: str,
    any_docs_name: str,
    frac_name: str,
) -> DataFrame:
    """Shared per-family audit scaffold (encoding_audit and scrub.pii_density
    differ only in their marker-count columns and output naming): project the
    per-row family counts once, fold with ONE map-side-combined aggregate on
    the group key, emit `{family}_{total_suffix}` / `{family}_docs` per
    family plus the any-family doc count and 6-dp fraction, sorted by group.

    ONE fused aggregate over one codegen projection: the counts are computed
    per row in the same stage as the scan, and only (group, partial-sums)
    rows reach the group-key exchange — at 10^12 rows the shuffle is
    K×|groups| no matter the corpus size (plan-pinned by
    test_corpus_audit_ops_are_single_agg_jvm_only).
    """
    proj = df.select(
        F.col(group_col).alias("grp"),
        *[cnt.alias(f"_{name}") for name, cnt in counts],
    )
    any_marker = None
    for name, _ in counts:
        cond = F.col(f"_{name}") > 0
        any_marker = cond if any_marker is None else (any_marker | cond)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for name, _ in counts:
        aggs.append(F.sum(f"_{name}").cast("bigint").alias(f"{name}_{total_suffix}"))
        aggs.append(
            F.sum((F.col(f"_{name}") > 0).cast("bigint")).alias(f"{name}_docs")
        )
    aggs.append(F.sum(any_marker.cast("bigint")).alias(any_docs_name))
    out = proj.groupBy("grp").agg(*aggs).select(
        F.col("grp").alias(group_col),
        "n_docs",
        *[f"{name}_{kind}" for name, _ in counts for kind in (total_suffix, "docs")],
        any_docs_name,
        F.round(F.col(any_docs_name) / F.col("n_docs"), 6).alias(frac_name),
    )
    return out.orderBy(group_col)
