"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001: the fused 9-dimension
quality-score profile (the reference's core scoring engine, engine.py:346-557,
collapsed from O(cols+rules) full-scan jobs into ≤3 fused passes);
`queries()` / `oracle_sql()` expose every implemented operator from SURVEY.md §2
(and the training-data ops) with DuckDB oracles. Implementations live in
`data_quality_check_spark.entry_queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_quality_check_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_queries.queries()["profile_scores_customer"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
