"""Deterministic profiling fixture — clone of the reference's embedded demo dataset.

Semantics per FIXTURES.md F1 (rates from app_v3.py:1397-1410, seed 42): 600 base rows
with injected defects at fixed modular positions, plus 25 duplicated rows. Expected
dimension scores are hand-derivable from the injection rates, which is what the
profiler unit tests assert.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
N_BASE = 600
N_DUP = 25

STATUS_VALUES = ["active", "ACTIVE", "Active", "inactive", None]
STATUS_P = [0.30, 0.20, 0.10, 0.35, 0.05]
COUNTRY_VALUES = ["France", "FRANCE", "france", "Germany", "N/A"]
COUNTRY_P = [0.30, 0.15, 0.10, 0.40, 0.05]


def demo_ecommerce_pdf(n: int = N_BASE, n_dup: int = N_DUP) -> pd.DataFrame:
    rng = np.random.RandomState(SEED)
    i = np.arange(1, n + 1)
    df = pd.DataFrame(
        {
            "id": i.astype("int64"),
            "email": np.where(i % 8 == 0, "invalid", pd.Series(i).map("user{}@mail.com".format)),
            "phone": np.where(i % 10 == 0, "abc", pd.Series(i).map("+336{:08d}".format)),
            "age": np.where(i % 15 == 0, -5, rng.randint(18, 80, size=n)).astype("int64"),
            "price": np.round(rng.exponential(scale=100.0, size=n), 2),
            "status": rng.choice(np.array(STATUS_VALUES, dtype=object), size=n, p=STATUS_P),
            "country": rng.choice(np.array(COUNTRY_VALUES, dtype=object), size=n, p=COUNTRY_P),
            "created_at": pd.date_range("2024-01-01", periods=n, freq="h").strftime(
                "%Y-%m-%d %H:%M:%S"
            ),
        }
    )
    dup = df.sample(n_dup, random_state=SEED)
    return pd.concat([df, dup], ignore_index=True)


def demo_ecommerce(spark, n: int = N_BASE, n_dup: int = N_DUP):
    return spark.createDataFrame(demo_ecommerce_pdf(n, n_dup))
