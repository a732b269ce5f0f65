"""Partitioned parquet writers + pruned read-back (SURVEY §2.A S6/S7/S11).

The reference lays Bronze out as hive-style `year=/month=/day=` paths by
hand-building S3 keys (kafka_consumer_s3.py:159-174) and writes Silver
with `partitionBy(year, month)` (silver_processor.py:321-324). Here the
layout IS the writer: `partitionBy` produces the identical directory
scheme, and readers prune by FILTERING on partition columns instead of
path arithmetic (silver_processor.py:134-140's manual path math) — so
Catalyst partition pruning, not string formatting, decides what's read.

Scale notes: date-partitioned layout bounds every incremental job to the
partitions it touches; `maxRecordsPerFile` caps file size so a skewed
day splits into multiple files instead of one multi-GB object. Snappy +
dictionary + column statistics are Spark parquet defaults (the options
the reference sets explicitly, kafka_consumer_s3.py:80-86).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATE_PARTS = ("year", "month", "day")


def with_date_partitions(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Add year/month/day partition columns derived from an event-time
    column — the derivation the reference does with key-path math."""
    return (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = DATE_PARTS,
    mode: str = "append",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Hive-layout parquet write (snappy; stats/dictionary by default)."""
    (
        df.write.mode(mode)
        .option("compression", "snappy")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_day(
    spark: SparkSession,
    path: str,
    year: int,
    month: int,
    day: int,
) -> DataFrame:
    """Partition-pruned scan of one day: a FILTER on partition columns
    (S10 done right — `.explain` shows PartitionFilters, and only that
    day's directory is listed/read)."""
    df = spark.read.parquet(path)
    return df.filter(
        (F.col("year") == year) & (F.col("month") == month) & (F.col("day") == day)
    )
