"""Streaming sinks: effectively-once delivery via checkpoint + idempotent
writes (SURVEY S8/S14).

The reference's contract — commit Kafka offsets only AFTER the S3 write
succeeds, absorb replays downstream with dedup + a UNIQUE index
(kafka_consumer_s3.py:238-240, silver_processor.py:191, schema.sql:86) —
maps to: checkpoint WAL for replay, and a ``foreachBatch`` writer that
anti-joins each micro-batch against the target's keys before appending,
so replayed batches are no-ops (the Spark twin of "duplicate key value"
errors downgraded to warnings, gold_loader.py:313-319).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.utils import AnalysisException


def idempotent_append_batch(
    batch_df: DataFrame, target_path: str, keys: Sequence[str]
) -> None:
    """Append only key-unseen rows of one micro-batch to a parquet target.

    At 100 TB the anti-join should be bounded: partition the target by an
    event-time bucket and read only partitions overlapping the batch's
    key range — here the target is small and read whole. The batch side
    of the anti-join is broadcast-sized by the trigger's back-pressure
    knob, so the probe never shuffles the target.
    """
    from pyspark.sql import functions as F

    spark = batch_df.sparkSession
    # WITHIN-batch dedup first (review r6, 11th pass): an at-least-once
    # replay can deliver both copies of a key in ONE micro-batch —
    # neither is in the target yet, so the anti-join alone keeps both.
    # Which copy survives is arbitrary (any one satisfies idempotence).
    batch = batch_df.dropDuplicates(list(keys))
    existing = _read_target_keys(spark, target_path, keys)
    if existing is not None:
        # NULL-SAFE anti join: a plain on=keys join uses '=', which
        # never matches NULL keys — a null-keyed row would re-append on
        # every replay (review r6, 11th pass)
        b, e = batch.alias("__b"), existing.alias("__e")
        cond = None
        for k in keys:
            c = F.col(f"__b.{k}").eqNullSafe(F.col(f"__e.{k}"))
            cond = c if cond is None else cond & c
        fresh = b.join(e, cond, "left_anti")
    else:
        fresh = batch
    fresh.write.mode("append").parquet(target_path)


def _read_target_keys(spark, path: str, keys: Sequence[str]) -> DataFrame | None:
    """Key projection of the target, or None if it doesn't exist yet.

    Existence is probed by attempting the read, not by os.path — the
    target may live on any Hadoop filesystem (s3a://, hdfs://, file://),
    where a local isdir() check would always say "empty" and silently
    break the effectively-once contract. A missing or still-empty target
    raises AnalysisException (PATH_NOT_FOUND / unable to infer schema),
    which is exactly the "nothing to dedup against" case. ONLY the read
    sits in the try (review r6, 11th pass): a missing/misnamed KEY
    column must fail loudly — swallowing it would silently disable
    dedup forever.
    """
    try:
        tgt = spark.read.parquet(path)
    except AnalysisException:
        return None
    return tgt.select(*keys)


def write_stream_idempotent(
    stream_df: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    available_now: bool = True,
):
    """``foreachBatch`` + checkpoint = the full S8 protocol: the WAL
    replays unacknowledged batches after failure; the idempotent batch
    writer makes the replay harmless."""
    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda bdf, _epoch: idempotent_append_batch(bdf, target_path, keys)
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer
