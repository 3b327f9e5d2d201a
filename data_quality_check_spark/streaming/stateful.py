"""Custom stateful streaming operator: cross-batch running quality counters.

The window/foreachBatch surfaces cover per-window and per-micro-batch metrics;
this covers the third shape — metrics that must ACCUMULATE across micro-batches
per group key (the reference's TableScore has no incremental form at all: every
`run_scoring` call rescans the table, engine.py:371-391). Keyed state via
`applyInPandasWithState`: the state store holds one small counter tuple per
group, each micro-batch folds its Arrow batches into it, and an updated
cumulative row is emitted per touched group.

State is O(groups) — a handful of longs per key — so a 10^12-row stream with a
bounded key domain (source, language, bucket) keeps constant-size state per
executor; this is the shape `applyInPandasWithState` is built for. The fold
itself is pandas-vectorized (one `isna().sum()` per batch, no per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "batches long, rows long, nulls long, violations long"
# `group` is the stringified key so one output schema serves any key type
# (source string, language string, bucket int, …)
OUT_SCHEMA = (
    "group string, batches long, rows_total long, nulls_total long, "
    "violations_total long, null_rate double, violation_rate double"
)


def running_group_metrics(
    df: DataFrame,
    group_col: str,
    check_cols: list[str],
    rule_col: str | None = None,
) -> DataFrame:
    """Per-group cumulative (rows, null cells, rule violations) over the life of
    the stream; emits one updated row per group per micro-batch that touched it.

    `check_cols` are counted for null cells; `rule_col` (optional) is a boolean
    column — precomputed upstream with the same `F.expr` rule DSL as the batch
    profiler, so the rule stays JVM-side — counted where false. Null rule ⇒ no
    violation (engine.py:445 convention). On a batch DataFrame use a plain
    groupBy; this operator exists for the streaming case where history is gone.
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = nulls = viols = 0
        for pdf in pdfs:
            rows += len(pdf)
            nulls += int(pdf[check_cols].isna().sum().sum())
            if rule_col is not None:
                # nullable booleans arrive as object dtype; normalize BEFORE
                # inverting (object-dtype ~True is int -2, not False)
                ok = pdf[rule_col].fillna(True).astype(bool)
                viols += int((~ok).sum())
        b0, r0, n0, v0 = state.get if state.exists else (0, 0, 0, 0)
        b, r, n, v = b0 + 1, r0 + rows, n0 + nulls, v0 + viols
        state.update((b, r, n, v))
        cells = r * len(check_cols)
        yield pd.DataFrame(
            [
                {
                    "group": None if key[0] is None else str(key[0]),
                    "batches": b,
                    "rows_total": r,
                    "nulls_total": n,
                    "violations_total": v,
                    "null_rate": (n / cells) if cells else 0.0,
                    "violation_rate": (v / r) if r else 0.0,
                }
            ]
        )

    return df.groupBy(group_col).applyInPandasWithState(
        fold, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
