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
from pyspark.errors import AnalysisException

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


def read_days_dynamic(
    spark: SparkSession,
    path: str,
    days: DataFrame,
) -> DataFrame:
    """Partition-pruned scan of the days listed in ``days`` (a small
    frame with year/month/day columns, e.g. an aggregate over another
    table) — WITHOUT collecting the day values to the driver: the
    broadcast join triggers DYNAMIC partition pruning, so only the
    matching directories are read, decided at runtime.

    The ``year >= 1970`` filter is semantically a no-op; it exists
    because Catalyst's DPP planner only prunes when the build side has a
    "likely selective" predicate (a literal comparison —
    ``isLikelySelective`` in the optimizer; an aggregate alone does not
    qualify). With it, the scan's PartitionFilters gains
    ``dynamicpruning#`` subqueries on year/month/day (plan-asserted in
    tests); without it, every partition would be listed.
    """
    dim = days.filter(F.col("year") >= F.lit(1970))
    return spark.read.parquet(path).join(
        F.broadcast(dim), on=list(DATE_PARTS), how="inner"
    )


def compact_partitioned(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    partition_cols: Sequence[str] = DATE_PARTS,
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Small-file compaction — rewrite a partitioned dataset so each
    partition directory holds few, right-sized files.

    Streaming ingest (one file per micro-batch per partition — the
    reference's one-parquet-per-100-messages layout,
    kafka_consumer_s3.py:154) accretes thousands of tiny files per
    partition; at 100 TB that is a metadata/listing bottleneck and a
    per-file open cost that dominates scans. The fix is periodic rewrite:
    repartition BY THE PARTITION COLUMNS so each partition dir's rows
    land in one shuffle partition (AQE coalesces small ones /
    splits skewed ones), then write with `maxRecordsPerFile` as the
    upper bound.

    Writes to ``dest_path`` — parquet directories cannot be rewritten
    in place while being read (that atomicity is what table formats'
    MERGE/OPTIMIZE add; with plain parquet, swap paths after the write).
    Returns {"files_before", "files_after", "rows"}.
    """
    def _count_files(p: str) -> int:
        # Hadoop FS listing, not local glob (review r6): glob silently
        # returns 0 on hdfs://s3a:// paths, faking a no-op compaction
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        it = fs.listFiles(hpath, True)
        n = 0
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                n += 1
        return n

    df = spark.read.parquet(src_path)
    rows = df.count()
    before = _count_files(src_path)
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(dest_path)
    )
    return {
        "files_before": before,
        "files_after": _count_files(dest_path),
        "rows": rows,
    }


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int = 1_000_000,
    num_files: int | None = None,
    drop_cols: Sequence[str] | None = None,
) -> None:
    """Cluster-on-write for data skipping — the plain-parquet analog of
    the reference's serving-side btree indexes (schema.sql:81-86) and of
    table-format Z-ordering (SURVEY §4 access-path row).

    repartitionByRange assigns disjoint key ranges to output files;
    sortWithinPartitions orders rows inside each. Parquet's row-group
    min/max statistics then become SELECTIVE: a point or range filter on
    the cluster key prunes whole files/row-groups at scan time instead
    of decoding them. On 100 TB this is the difference between reading
    one file and reading all of them for a needle query. (Multi-column
    needle queries across independent dimensions want true Z-ordering —
    a space-filling curve — which needs a table format or an explicit
    interleave-bits column; single-dimension range clustering is the
    parquet-native 90% case.)
    """
    cols = [F.col(c) for c in cluster_cols]
    ranged = (
        df.repartitionByRange(num_files, *cols)
        if num_files is not None  # pin file count; else AQE sizes it
        else df.repartitionByRange(*cols)
    )
    clustered = ranged.sortWithinPartitions(*cluster_cols)
    if drop_cols:
        # layout-only helper columns (e.g. the Morton value): cluster +
        # sort on them, keep them OUT of the files — the narrow drop
        # preserves the partition-local ordering
        clustered = clustered.drop(*drop_cols)
    (
        clustered
        .write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] = DATE_PARTS,
) -> dict:
    """Partition-bounded MERGE (SCD-1 upsert) on plain parquet — the
    general form of the reference's idempotent load (S14, gold_loader.py:
    296-319): rows matching on ``key_cols`` are REPLACED by the update,
    new keys are inserted, untouched partitions are not rewritten.

    Mechanics: the updates' distinct partition values (a driver-side
    list bounded by partitions touched, NOT data size) select the target
    partitions to read; existing rows lose matches via left-anti join on
    the keys; survivors union the updates; `partitionOverwriteMode=
    dynamic` overwrites ONLY the touched partition directories. Rewrite
    cost scales with touched-partition bytes — at 100 TB an update
    stream touching today's partition rewrites ~1/365th of the table,
    never the whole thing. (Table formats make this transactional and
    row-level; this is the contract on plain parquet.)

    ``updates`` must carry the partition columns. SCOPE OF UNIQUENESS:
    key_cols uniqueness is guaranteed only WITHIN a partition. An update
    whose partition-column value differs from the live row's (a
    late-arriving correction that moves a key to another day) inserts
    into the new partition but leaves the stale row in the old one —
    duplicate keys table-wide. Derive partition_cols from key_cols (as
    the contract query does: key includes the date) or pre-delete moved
    keys from their old partitions before calling. Returns
    {"touched_partitions", "updated_or_inserted"}.
    """
    missing = [c for c in partition_cols if c not in updates.columns]
    if missing:
        raise ValueError(
            f"merge_upsert_partitioned: updates lack partition columns {missing}; "
            "partition-bounded merge cannot locate target partitions without them"
        )
    part_vals = updates.select(*partition_cols).distinct().collect()
    touched = [tuple(r) for r in part_vals]
    cond = F.lit(False)
    for vals in touched:
        match = F.lit(True)
        for c, v in zip(partition_cols, vals):
            # NULL-SAFE (review r6, same hole as erase_keys_partitioned):
            # a NULL partition value under plain == filters the whole
            # __HIVE_DEFAULT_PARTITION__ out of `target`, so its
            # unmatched rows never become survivors — yet dynamic
            # overwrite still rewrites that directory, silently
            # DELETING every pre-existing row the update didn't carry
            match = match & F.col(c).eqNullSafe(F.lit(v))
        cond = cond | match
    try:
        target = spark.read.parquet(target_path).filter(cond)
    except AnalysisException:
        # first write bootstraps the table — the MERGE of an empty
        # target is just the partitioned insert (the path a foreachBatch
        # CDC sink hits on its first micro-batch)
        updates.write.mode("overwrite").partitionBy(*partition_cols).parquet(
            target_path
        )
        return {
            "touched_partitions": len(touched),
            "updated_or_inserted": updates.count(),
        }
    survivors = target.join(
        updates.select(*key_cols), list(key_cols), "left_anti"
    )
    # materialize BEFORE writing: the merged frame reads the very
    # partitions the write overwrites (Spark refuses the cycle, and a
    # lazy plan would re-scan mid-overwrite). Bounded by touched
    # partitions, not table size.
    merged = survivors.unionByName(updates.select(*target.columns)).localCheckpoint()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(target_path)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "touched_partitions": len(touched),
        "updated_or_inserted": updates.count(),
    }


def erase_keys_partitioned(
    spark: SparkSession,
    target_path: str,
    keys: DataFrame,
    key_col: str,
    partition_cols: Sequence[str] = DATE_PARTS,
) -> dict:
    """Partition-bounded DELETE propagation on plain parquet — the
    right-to-erasure ("GDPR delete") primitive every lakehouse needs:
    every row whose ``key_col`` appears in ``keys`` is removed, and
    ONLY partitions that actually contain such rows are rewritten.

    Mechanics mirror :func:`merge_upsert_partitioned` but the touched-
    partition discovery comes from the TARGET side: a semi-join of the
    table against the (broadcastable) key set, aggregated to distinct
    partition values — a driver list bounded by partition count, never
    data size. Survivors are the anti-join within those partitions;
    ``partitionOverwriteMode=dynamic`` swaps only the touched
    directories. An erasure batch touching k days rewrites k/365ths of
    a year-partitioned table.

    100 TB: the discovery pass is a column-pruned scan of (key_col +
    partition cols) with the key set broadcast (erasure lists are
    small by nature; a giant list becomes a shuffle semi-join — same
    plan shape). Deletion is VERIFIED: returns rows_erased and the
    caller can re-scan; table formats add transactionality, not
    different mechanics. Returns {"touched_partitions", "rows_erased",
    "rows_remaining_in_touched"}.
    """
    target = spark.read.parquet(target_path)
    missing = [c for c in partition_cols if c not in target.columns]
    if missing:
        raise ValueError(
            f"erase_keys_partitioned: target lacks partition columns {missing}"
        )
    hits = target.join(F.broadcast(keys), key_col, "semi")
    part_vals = hits.select(*partition_cols).distinct().collect()
    touched = [tuple(r) for r in part_vals]
    if not touched:
        return {
            "touched_partitions": 0,
            "rows_erased": 0,
            "rows_remaining_in_touched": 0,
            "partitions_emptied": 0,
        }
    cond = F.lit(False)
    for vals in touched:
        match = F.lit(True)
        for c, v in zip(partition_cols, vals):
            # NULL-SAFE equality: a row with a NULL partition value
            # (Hive __HIVE_DEFAULT_PARTITION__) must still be located —
            # `col == lit(None)` is SQL NULL and would silently exclude
            # the whole partition from the rewrite, leaving the
            # to-be-erased rows on disk (review r6 finding)
            match = match & F.col(c).eqNullSafe(F.lit(v))
        cond = cond | match
    scoped = target.filter(cond)
    n_before = scoped.count()
    survivors = scoped.join(F.broadcast(keys), key_col, "left_anti")
    # materialize BEFORE overwriting the partitions being read
    # (see merge_upsert_partitioned)
    merged = survivors.localCheckpoint()
    n_after = merged.count()

    # dynamic overwrite only replaces partitions PRESENT in the written
    # data — a partition whose every row was erased writes nothing and
    # its old directory (with the very rows being erased!) would
    # survive. Delete those directories explicitly via the Hadoop FS.
    alive = {tuple(r) for r in merged.select(*partition_cols).distinct().collect()}
    emptied = [vals for vals in touched if vals not in alive]

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(target_path)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    if emptied:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for vals in emptied:
            # NULL partition values live in the Hive default directory
            seg = "/".join(
                f"{c}={'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
                for c, v in zip(partition_cols, vals)
            )
            p = jvm.org.apache.hadoop.fs.Path(f"{target_path}/{seg}")
            p.getFileSystem(hconf).delete(p, True)
    return {
        "touched_partitions": len(touched),
        "rows_erased": n_before - n_after,
        "rows_remaining_in_touched": n_after,
        "partitions_emptied": len(emptied),
    }
