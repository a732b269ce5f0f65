"""Window operators (SURVEY §2.E).

  W1 latest-row-per-group (Postgres DISTINCT ON, schema.sql:211-223) —
     standardized on the row_number()=1 formulation (SURVEY §7 hard parts:
     DISTINCT ON has no Spark/DuckDB-portable form).
  ∅→native: rank/dense_rank/ntile, lag/lead deltas, running aggregates
     with explicit frames — declared engine capabilities over events/orders.

Scale: one shuffle on the partition key per window spec; multiple
functions over the SAME spec share that shuffle (Spark plans a single
Window exec). Avoid global (un-partitioned) windows — they serialize to
one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def latest_per_key(df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: Sequence[str] = ()) -> DataFrame:
    """W1 — newest row per key (v_latest_weather, schema.sql:211-223).

    ``tiebreak`` columns make the choice deterministic when ``ts_col``
    ties (the oracle needs a defined winner).
    """
    order = [F.desc(ts_col)] + [F.desc(c) for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def ranked(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    fn: str = "rank",
    alias: str | None = None,
) -> DataFrame:
    """Ranking window functions (rank/dense_rank/row_number/ntile-free)."""
    fns = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(alias or fn, fns[fn]().over(w))


def lag_delta(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    alias: str = "delta",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """lag-based per-key delta of a measure, ordered by event time
    (SURVEY §2.E declared capability: delta of value per user_id).
    ``tiebreak``: extra ordering columns — without one, equal
    timestamps make the delta partition-layout-dependent (review r6;
    the production query lag_delta_q passes event_id for exactly this
    reason)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col), *[F.col(k) for k in tiebreak]
    )
    return df.withColumn(alias, F.col(value_col) - F.lag(value_col).over(w))


def running_sum(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    alias: str = "running_sum",
) -> DataFrame:
    """Running aggregate with an explicit rows frame
    (SURVEY §2.E: running sum of o_totalprice per customer)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value_col).over(w))


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Batch gap-based sessionization — the batch twin of
    streaming/windows.py's session_window (SURVEY §2.J ∅→native row).

    A session breaks when the gap to the previous event of the same key
    exceeds ``gap_seconds``. Classic two-window formulation: lag() marks
    session starts, a running sum over the same window spec numbers them
    (``session_id`` is 1-based per key). Both windows share ONE shuffle
    on ``keys`` (same partition spec); gaps are compared in integer
    microseconds so the boundary is exact (double seconds would round).

    Scale: one shuffle; per-key data must fit a task's sort buffer —
    fine for user-keyed event data (no single user has 100 TB of
    events). ``tiebreak`` makes ordering total when timestamps tie.
    """
    us = F.unix_micros(F.col(ts_col))
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_us = int(gap_seconds) * 1_000_000
    prev = F.lag(us).over(w)
    is_start = (prev.isNull() | ((us - prev) > gap_us)).cast("int")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(is_start).over(running))


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-K rows per group — row_number ≤ K over a per-group ordering."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")
