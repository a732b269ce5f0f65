"""Incremental view maintenance over the transaction log's streaming
CDC — the capstone composition of the storage layer: a txlog SOURCE
table streams its change feed (``txlog_feed`` with ``mode="cdf"``),
and a foreachBatch sink folds each micro-batch's retraction rows into
a txlog TARGET aggregate table with an EXACTLY-ONCE keyed merge.

Why this shape survives 100 TB:

- The source side reads O(changed files) per trigger (the CDC
  planner), never the table.
- The delta computation is one hash aggregate over the batch's change
  rows — signed counts (+insert/−delete) and signed integer sums.
- The target side is a keyed merge that rewrites O(files overlapping
  the touched key range) of the (small) aggregate table.
- Exactly-once rides the target's txn watermark
  (:meth:`TxTable.merge_upsert` ``stream_txn``): Structured Streaming
  re-delivers the last batch after any restart, and a READ-MODIFY-WRITE
  sink applied twice corrupts the aggregate — the watermark (checked
  inside the commit retry loop, so even concurrent replays serialize
  through the log's put-if-absent) makes the replay a no-op.

The maintained measures are count and an INTEGER cents sum: integer
deltas commute and associate EXACTLY, so the incrementally-maintained
table equals the direct aggregate bit-for-bit regardless of batch
boundaries or accumulation order — floating-point sums would drift at
the ulp level and break value-hash equality. (A float measure works
operationally; it just can't promise hash-exact parity, which is the
contract this module tests against.)

Retracted-to-zero keys stay as ``n_rows = 0`` tombstone rows in the
target (the merge path has no delete leg); :func:`current_view`
filters them — the standard IVM tombstone convention.

Public-design note: this is the "aggregate materialized view over a
change feed" pattern the lakehouse ecosystems ship (Delta Live Tables
/ Materialize-style SUM/COUNT views); re-expressed here over this
repo's own log format, CDC source, and exactly-once merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.txlog import TxTable

MV_SCHEMA_SUFFIX = "n_rows bigint, sum_cents bigint"


def mv_schema(key: str, key_type: str) -> str:
    """DDL for a sum/count view keyed by ``key``."""
    return f"{key} {key_type}, {MV_SCHEMA_SUFFIX}"


def signed_weight():
    """+1 per CDC insert, −1 per delete — THE retraction fold weight.
    Shared by this module and mv.py so the two maintained-view paths
    (streaming IVM, batch-incremental MV) cannot drift semantically."""
    return F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )


def cents(col) -> "F.Column":
    """Integer cents of a double measure (NULL → 0): integer deltas
    commute exactly, which is what makes maintained sums bit-equal to
    direct aggregates under any batch boundaries. Shared with mv.py."""
    return F.coalesce(
        F.floor(col * 100 + F.lit(0.5)).cast("bigint"), F.lit(0)
    )


def delta_for_batch(batch_df: DataFrame, key: str, value_col: str) -> DataFrame:
    """One micro-batch of CDC rows → per-key signed delta:
    ``n_rows`` (+1 insert / −1 delete) and ``sum_cents`` (signed,
    integer cents of ``value_col``; NULL values contribute 0).

    NULL group keys are EXCLUDED here: the source table does not
    constrain the key non-null, and a NULL-key delta row would make
    :meth:`TxTable.merge_upsert` raise ("NULL update keys") on every
    trigger — wedging the maintained view permanently. Dropping them
    means the view simply carries no row for the NULL group (the same
    choice Delta's MERGE makes: NULL never equi-matches a key anyway);
    a deployment that needs the NULL group aggregates it under a
    sentinel key upstream (ADVICE r6)."""
    w = signed_weight()
    c = cents(F.col(value_col))
    return (
        batch_df.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(
            F.sum(w).cast("bigint").alias("n_rows"),
            F.sum(w * c).cast("bigint").alias("sum_cents"),
        )
    )


def foreach_batch_view_sink(
    target: TxTable, key: str, value_col: str, app_id: str
):
    """``writeStream.foreachBatch(...)`` sink maintaining ``target`` as
    the sum/count view of a CDC stream. Read-modify-write per batch:
    current values for the touched keys join the delta, and the merged
    rows upsert with the batch's txn watermark (exactly-once)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        delta = delta_for_batch(batch_df, key, value_col)
        cur = target.read().select(
            F.col(key),
            F.col("n_rows").alias("__cur_n"),
            F.col("sum_cents").alias("__cur_s"),
        )
        merged = (
            delta.join(cur, key, "left")
            .select(
                F.col(key),
                (
                    F.coalesce(F.col("__cur_n"), F.lit(0)) + F.col("n_rows")
                ).alias("n_rows"),
                (
                    F.coalesce(F.col("__cur_s"), F.lit(0))
                    + F.col("sum_cents")
                ).alias("sum_cents"),
            )
        )
        target.merge_upsert(merged, key, stream_txn=(app_id, batch_id))

    return _sink


def current_view(target: TxTable) -> DataFrame:
    """The maintained view with retracted-to-zero tombstones hidden."""
    return target.read().filter(F.col("n_rows") > 0)
