"""Count-Min sketch: fixed-size mergeable frequency counters.

Complements the exact/heavy-hitter family (`operators/heavy.py`'s
Misra-Gries keeps the top-k IDENTITIES exactly; Count-Min answers
point frequency queries for ANY key in O(d) reads from d·w counters,
with one-sided error: est ≥ true, est ≤ true + εN w.p. 1−δ where
ε = e/width, δ = e^−depth).

Spark-first shape: the token stream explodes into (row_index, bucket)
pairs and folds through ONE map-side-combined groupBy whose partial
state is capped at depth·width cells per task — the stream is never
shuffled at occurrence grain, which is the entire point of a sketch
at 100 TB (the same property heavy.exact_topk's pass 1 has). Counter
tables from disjoint data slices MERGE by (i, bucket) summation, so
incremental maintenance is a union + re-groupBy.

Hashing is the md5-prefix trick from dedup/simhash.py (the one hash
both Spark and DuckDB expose bit-identically), so a SQL oracle can
recompute the whole sketch — the estimates are cross-engine-checkable,
not just the exact counts. Reference surface: the reference has no
sketches at all (its quality gates recount exactly,
quality_check.py:61-118); this is the scale path those gates need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col: F.Column, i: int, width: int) -> F.Column:
    """Row ``i``'s bucket for a string key: md5 of ``"{i}:" + key``,
    first 8 hex chars as an integer, mod width. DuckDB twin:
    ``('0x' || substr(md5(i || ':' || key), 1, 8))::BIGINT % width``."""
    h = F.md5(F.concat(F.lit(f"{i}:"), col).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias(
        "bucket"
    )


def countmin_counters(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the d×w counter table over every occurrence of ``col``.

    Returns (i int, bucket long, c long). Partial aggregation caps
    each task's output at depth·width rows, so the shuffle carries
    O(tasks · d · w) rows regardless of stream size."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _bucket(F.col(col), i, width),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e")
    )
    return cells.groupBy(
        F.col("e.i").alias("i"), F.col("e.bucket").alias("bucket")
    ).agg(F.count("*").alias("c"))


def countmin_estimate(
    counters: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    out: str = "cm_est",
) -> DataFrame:
    """Point-query the sketch for each distinct key in ``probes``:
    est(key) = min_i counters[i][h_i(key)].

    The counter table is ≤ d·w rows by construction — broadcast it;
    the probe side stays distributed (no collect, any probe count)."""
    pb = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _bucket(F.col(col), i, width),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e"),
    ).select(col, "e.i", "e.bucket")
    # LEFT join: a probe key hashing to a bucket with no counter row
    # hit an empty (zero) cell — an inner join would drop the zero
    # from the min (estimate could exceed true+eps*N) and make a key
    # with all d cells empty vanish instead of returning est=0.
    return (
        pb.join(F.broadcast(counters), ["i", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias(out))
    )
