"""Sequence packing — assign documents/chunks to fixed-capacity training
sequences (the "concat-and-split" packing every pre-training data loader
performs: stream items in a deterministic order, cut a new sequence each
time the running token count crosses the context size).

The bin id of an item is ``floor(start_offset / capacity)`` where
start_offset is the cumulative token count of everything before it — the
exact result of concatenating the stream and slicing at capacity
boundaries. Items may straddle a boundary; they are counted in the bin
where they START (their tail spills into the next sequence, as in real
concat-and-split loaders).

Scale: a GLOBAL ordered cumsum is a single-partition window — a
non-starter at 100 TB. Packing is therefore scoped per ``partition_cols``
group (source/shard/worker): each group packs independently in parallel
(one hash shuffle + in-partition sort), which is exactly how distributed
loaders shard anyway. The order inside a group is an explicit column so
packing is deterministic and re-runnable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    size_col: str,
    order_col: str | Sequence[str],
    partition_cols: Sequence[str],
    capacity: int,
    bin_col: str = "bin_id",
    offset_col: str = "start_offset",
) -> DataFrame:
    """Add (start_offset, bin_id) per row: concat-and-split packing of
    ``size_col`` tokens in ``order_col`` order within each
    ``partition_cols`` group. One window (hash shuffle on the group key +
    sort), no iteration.

    ``order_col`` must be a TOTAL order within each partition group
    (pass a list of tie-breaking columns when one isn't): a non-total
    order makes the running-sum offsets partition-layout-dependent."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(F.col(size_col)).over(w) - F.col(size_col)
    return df.withColumn(offset_col, start).withColumn(
        bin_col, F.floor(F.col(offset_col) / F.lit(capacity))
    )
