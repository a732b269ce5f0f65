"""Bucketed tables — co-located joins & aggregations without shuffles
(SURVEY §7 "co-locate joins via bucketing"; serving access-path analog
of the reference's btree indexes, SURVEY §4 last row).

`bucketBy(n, keys)` writes each file pre-hash-partitioned on the join/
group keys. When both sides of an equi join are bucketed on the key
with the same bucket count, SortMergeJoin reads buckets pairwise and
the plan contains ZERO Exchange operators — at 100 TB that removes the
dominant cost of fact⋈fact joins (dims are broadcast; bucketing is for
the joins too big to broadcast). Same for groupBy on the bucket key.

Bucketed writes require a managed table (`saveAsTable` — the metastore
records bucket metadata; a bare `.parquet(path)` write silently drops
it). `sortBy` within buckets additionally gives min/max-skipping and
merge-ready runs (the sortWithinPartitions serving trick).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a managed bucketed (optionally sorted) parquet table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on `on` with equal bucket counts —
    plans as a shuffle-free SortMergeJoin (asserted in
    tests/test_bucketing.py via plans.exchange_count == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
