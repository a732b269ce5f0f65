"""Stream-stream joins (SURVEY §2.F × §2.J — the join surface under
Structured Streaming).

Spark refuses a stream-stream join whose condition has no equality
predicate: the symmetric hash join keys its state stores on the equi
key, and without one every row would probe every stored row. A pure
proximity join (|l_ts − r_ts| ≤ tol) therefore borrows the batch
time-bucket trick (operators/joins.py::time_bucket_range_join): bucket
both event times into tolerance-sized bins, fan the left side out to
bucket±1, join on bucket equality, filter the exact range inside the
bucket. Watermarks on BOTH inputs + the range condition let Spark
derive state-eviction bounds, so neither side buffers unbounded
history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMS on |left_ts − right_ts| ≤ tolerance
    (``how``: "inner" or "left_outer").

    Both inputs must be streaming DataFrames with distinct column names
    (the time columns stay in the output). State per side is bounded by
    watermark + tolerance; microsecond bucket arithmetic keeps the
    boundary exact (second-truncating unix_timestamp would widen it).

    The bucket fan-out goes on the RIGHT side, left rows keep their
    single bucket. For inner joins either choice is equivalent (each
    qualifying pair meets on exactly one bucket value); for LEFT OUTER
    it is load-bearing: an exploded left row would emit a spurious
    null-padded result for every bucket copy that found no partner,
    even when another copy matched. Unexploded, a left row is
    null-padded iff it matched nothing at all — once the right
    watermark passes its eviction bound.
    """
    tol_us = int(tolerance_seconds) * 1_000_000
    bucket = lambda c: F.expr(f"unix_micros({c}) div {tol_us}")  # noqa: E731
    l = left.withWatermark(left_ts, watermark).withColumn(
        "__bucket", bucket(left_ts)
    )
    r = right.withWatermark(right_ts, watermark).withColumn(
        "__bucket",
        F.explode(
            F.array(bucket(right_ts) - 1, bucket(right_ts), bucket(right_ts) + 1)
        ),
    )
    # two explicit inequalities, NOT abs(l-r) <= tol: Spark's outer-join
    # state analysis pattern-matches range predicates between the two
    # watermarked columns to derive eviction bounds, and abs() defeats it
    # ("LeftOuter join ... not supported without ... an appropriate
    # range condition"). Timestamp ± INTERVAL keeps µs exactness.
    iv = F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
    within = (F.col(left_ts) >= F.col(right_ts) - iv) & (
        F.col(left_ts) <= F.col(right_ts) + iv
    )
    return (
        l.join(r, (l["__bucket"] == r["__bucket"]) & within, how)
        .drop("__bucket")
    )
