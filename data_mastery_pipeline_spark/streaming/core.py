"""Stream sources and deterministic test-mode runners.

The file stream source here is the micro-batch twin of the reference's
Kafka→buffer→flush loop (kafka_consumer_s3.py:176-241): Spark's file
source lists new files per trigger (rate-limited by
``maxFilesPerTrigger``), the checkpoint WAL replaces manual offset
commits (S8, kafka_consumer_s3.py:238-240).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over the events table (schema-enforced file source).

    Same TIMESTAMP(NANOS) handling as the batch scan (tables.load_table):
    raw int64 nanos → floor-divide to µs. ``maxFilesPerTrigger`` is the
    file-source analog of Kafka's ``maxOffsetsPerTrigger`` back-pressure
    knob (reference batch_size, config/config.yaml:12).
    """
    # The testdata table is a single parquet FILE; the file stream source
    # only accepts a directory or a glob, so glob the file (a real
    # deployment points this at the Bronze landing directory — new files
    # per trigger = the micro-batches).
    reader = spark.readStream.schema(schemas.EVENTS_RAW).option("basePath", sf_dir)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(f"{sf_dir}/events*.parquet")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_available_now(
    stream_df: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
) -> DataFrame:
    """Drain a finite stream through the memory sink and return the
    result as a batch DataFrame.

    ``availableNow`` processes everything currently on disk then stops —
    the deterministic harness for checking streaming transformations
    against the batch oracle. Throwaway checkpoint per run (a real
    deployment pins the checkpoint dir; see sinks.py).
    """
    name = query_name or f"q_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
