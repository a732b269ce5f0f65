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


class IntervalJoinFanoutError(RuntimeError):
    """The interval join's expected per-row fan-out exceeds its bound —
    the event-time distribution is degenerate (collapsed timestamps) or
    the tolerance is far too wide for the stream's density."""


def check_interval_fanout(
    right_batch: DataFrame,
    right_ts: str,
    tolerance_seconds: int,
    max_expected_matches_per_row: float = 64.0,
) -> float:
    """Pre-flight degeneracy probe for an interval join: estimate the
    EXPECTED matches per probe row as ``right-side event density ×
    2·tolerance`` and raise :class:`IntervalJoinFanoutError` when it
    exceeds the bound.

    Why this exists: when the round-3 testdata regen collapsed every
    event timestamp into a 2-hour span (ns misread as µs), the ±2-minute
    interval join silently produced 1000× the correct row count — the
    join itself has no notion of "this output is absurd". Density is the
    cheapest signal that catches exactly that failure: a 1000× time
    collapse is a 1000× density spike, while legitimate load growth also
    grows the time span and leaves density stable.

    Cost: one scalar aggregate (count/min/max) over the BATCH twin of
    the stream input — min/max/count come from parquet footer stats
    when aggregate pushdown applies, so at 100 TB this reads metadata,
    not data. For a long-running streaming job, run the same expression
    per micro-batch via ``foreachBatch`` or an ``observe()`` listener
    instead of a pre-flight scan.

    Returns the expected-matches estimate (useful for logging/tests).
    """
    n, mn, mx = right_batch.agg(
        F.count(F.col(right_ts)),
        F.min(right_ts),
        F.max(right_ts),
    ).first()
    if not n:
        return 0.0
    span_sec = max((mx - mn).total_seconds(), 1.0)
    # density uses n−1 intervals over the span, and the estimate is
    # capped at n: one right row can match at most once per probe row,
    # so a 1-row (or tiny clustered) batch must never trip the
    # degeneracy error (review r6, 11th pass: n=1 with tolerance 60s
    # read as "120 expected matches" and aborted a healthy pipeline)
    expected = min(float(n), ((n - 1) / span_sec) * 2.0 * float(tolerance_seconds))
    if expected > max_expected_matches_per_row:
        raise IntervalJoinFanoutError(
            f"interval join fan-out check: {n} rows over {span_sec:.0f}s "
            f"→ expected {expected:.1f} matches/row at ±{tolerance_seconds}s "
            f"(bound {max_expected_matches_per_row}). Event time looks "
            f"degenerate — check the source's timestamp decoding before "
            f"trusting this join's output."
        )
    return expected


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
    if tol_us <= 0:
        # div 0 crashes every row under ANSI (and null-buckets silently
        # empty the join without it) — review r6, 11th pass
        raise ValueError(
            "interval_join_streams: tolerance_seconds must be > 0 "
            "(exact-timestamp matching is an equi-join on the timestamp)"
        )
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
