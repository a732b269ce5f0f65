"""Per-key sequential recurrences (EWMA) — the Arrow-batched pandas path.

Most of the engine stays in Catalyst expressions (SURVEY §2.K: the
reference itself has zero Spark UDFs), but a genuine recurrence —
y_t = α·x_t + (1−α)·y_{t−1} — has no bounded-depth Catalyst form: each
output depends on the full prefix. That is exactly the case the
``applyInPandas`` surface exists for (declared engine capability,
SURVEY §2.K): Spark shuffles each key's rows to one task, Arrow hands
them to pandas as one batch, and the recurrence runs in-process.

Scale shape: ONE shuffle on the key columns; state never crosses rows
of different keys, so a 100 TB events table parallelizes over keys.
Skewed keys (one user with billions of rows) are the known limit of any
per-key-batch operator — mitigate upstream with sessionized sub-keys.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def ewma_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average of ``value_col`` per key,
    ordered by ``order_cols`` (include a unique tie-breaker for
    determinism): y_1 = x_1, y_t = α·x_t + (1−α)·y_{t−1}.

    The recurrence is evaluated with exactly that expression order, so
    results are bit-reproducible and match any engine computing the
    same recursion (the DuckDB oracle uses a recursive CTE with the
    identical formula). Null values must be filtered by the caller —
    a recurrence has no engine-agnostic null convention.

    Implementation: a per-group O(n) loop over the Arrow batch. For
    very long per-key series swap in an equivalent compiled kernel
    (e.g. scipy.signal.lfilter) — kept out here to avoid an optional
    dependency and to pin the exact arithmetic order.
    """
    cols = [*key_cols, *order_cols, value_col]
    # drop duplicates between key/order/value references, keep order
    seen: list[str] = []
    for c in cols:
        if c not in seen:
            seen.append(c)
    proj = df.select(*seen)
    out_schema = StructType(
        list(proj.schema.fields) + [StructField(out_col, DoubleType())]
    )
    order_list = list(order_cols)
    a = float(alpha)

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_list, kind="mergesort")
        out = []
        prev: float | None = None
        for v in pdf[value_col].astype("float64"):
            prev = v if prev is None else a * v + (1.0 - a) * prev
            out.append(prev)
        pdf[out_col] = out
        return pdf

    return proj.groupBy(*key_cols).applyInPandas(_ewma, out_schema)
