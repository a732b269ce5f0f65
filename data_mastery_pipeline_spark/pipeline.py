"""The reference's whole DAG as ONE Spark application (SURVEY §3.1).

The reference chains seven Airflow tasks across process boundaries
(check_api → ingest → consume → silver → gold → quality → cleanup,
weather_pipeline_dag.py:316-317), shipping state through Kafka, S3 and
XCom. Here the same dataflow is a single lazy plan per stage: the REST
data source feeds the Silver cleaning/derivation/aggregation operators
directly, Gold is the partitioned writer, and quality/run-log are
engine-level checks — only the serving sink (JDBC) remains an external
boundary. Stage boundaries that were processes become DataFrames.

Every transformation is the library operator the contract queries
already oracle-check; this module only composes them.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import checkpointing
from .functions.timefn import time_parts
from .operators import cleaning, derive, quality
from .sources import rest, runlog, writers

TEMP_BOUNDS = (-100.0, 60.0)  # silver_processor.py:118-119 / config.yaml:63-64


def ingest_bronze(
    spark: SparkSession,
    cities: Sequence[str] = rest.DEFAULT_CITIES,
    start_epoch: int = 1_700_000_000,
    n_cycles: int = 24,
    interval: int = 3600,
) -> DataFrame:
    """Bronze: N poll cycles of the REST source in ONE scan (the batch
    backfill form — cities × cycles input partitions; the streaming form
    is rest.stream_weather + the same operators under foreachBatch)."""
    return rest.read_weather(
        spark, cities, epoch=start_epoch, n_cycles=n_cycles, interval=interval
    )


def to_silver(bronze: DataFrame) -> DataFrame:
    """Silver detail: the reference's clean → derive chain
    (silver_processor.py:157-253) on library operators."""
    cleaned = cleaning.drop_null_rows(bronze, ["city", "timestamp", "temperature"])
    cleaned = cleaning.range_filter(cleaned, "temperature", *TEMP_BOUNDS)
    cleaned = cleaning.dedup_deterministic(
        cleaned, ["city", "timestamp"], [F.desc("ingestion_timestamp"), F.asc("country")]
    )
    derived = time_parts(cleaned, "timestamp")
    return derived.withColumns(
        {
            "temp_range": derive.col_range("temp_max", "temp_min"),
            "heat_index": derive.heat_index("temperature", "humidity"),
            "is_weekend": derive.flag_in_set("day_of_week", [1, 7]),
            "is_day": derive.flag_between_cols("timestamp", "sunrise", "sunset"),
            "quality_score": quality_score_col(),
        }
    )


def quality_score_col():
    """P6 over the reference's five optional fields
    (silver_processor.py:206-213)."""
    return cleaning.quality_score(
        ["feels_like", "pressure", "wind_speed", "visibility", "clouds"]
    )


def silver_daily(silver: DataFrame) -> DataFrame:
    """A1 — the reference's daily aggregate, measure-for-measure
    (silver_processor.py:279-290)."""
    return silver.groupBy("city", "country", "year", "month", "day").agg(
        F.avg("temperature").alias("avg_temperature"),
        F.min("temp_min").alias("min_temperature"),
        F.max("temp_max").alias("max_temperature"),
        F.avg("humidity").alias("avg_humidity"),
        F.avg("wind_speed").alias("avg_wind_speed"),
        F.avg("pressure").alias("avg_pressure"),
        F.count("*").alias("record_count"),
    )


def silver_hourly(silver: DataFrame) -> DataFrame:
    """A2 — hourly grain (silver_processor.py:293-304)."""
    return silver.groupBy("city", "country", "year", "month", "day", "hour").agg(
        F.avg("temperature").alias("avg_temperature"),
        F.avg("humidity").alias("avg_humidity"),
        F.count("*").alias("record_count"),
    )


@dataclass
class PipelineResult:
    silver_rows: int
    daily_rows: int
    hourly_rows: int
    quality: quality.QualityReport
    audit: DataFrame  # one row per stage (runlog)


def run_weather_pipeline(
    spark: SparkSession,
    out_dir: str,
    cities: Sequence[str] = rest.DEFAULT_CITIES,
    start_epoch: int = 1_700_000_000,
    n_cycles: int = 24,
) -> PipelineResult:
    """End-to-end: ingest → silver → gold writes, each stage under
    run-logging, with the quality gate before serving (the DAG's
    quality_check → load ordering)."""
    audits = []

    def staged(stage: str, action):
        result, audit = runlog.run_stage(spark, "weather_pipeline", stage, action)
        audits.append(audit)
        if result is None:
            # surface the captured failure, not just "see audit row" —
            # the audit DataFrame is never returned on an aborted run
            err = audit.select("error").first()["error"]
            raise RuntimeError(f"stage {stage} failed: {err}")
        return result

    bronze = ingest_bronze(spark, cities, start_epoch, n_cycles)
    # observe() rides the stage writes below — row counts come from the
    # jobs that run anyway, not from the reference's count-per-stage
    # re-executions (silver_processor.py:148,198,326 anti-pattern)
    silver, s_obs = quality.with_observed_metrics(to_silver(bronze), "silver_obs")
    # Materialize silver ONCE: five downstream actions consume it (the
    # silver write, check_quality's jobs, both gold writes). Without the
    # cut, each action re-executes the bronze REST fetch + the whole
    # clean/derive chain — against a live API the quality gate could
    # then pass on DIFFERENT data than what was written (review r6).
    # The observation above still fills on the checkpoint job itself.
    silver = checkpointing.truncate_lineage(silver)

    def write_silver():
        # to_silver already derived year/month/day via time_parts —
        # write_partitioned partitions on the existing columns
        writers.write_partitioned(
            silver,
            os.path.join(out_dir, "weather_cleaned"),
            mode="overwrite",
        )
        return silver, None

    staged("silver_detail", write_silver)

    rep = quality.check_quality(
        silver,
        key_cols=["city", "timestamp"],
        null_checked=["city", "timestamp", "temperature"],
        range_checks=[("temperature", *TEMP_BOUNDS)],
    )
    if not rep.passed:
        raise RuntimeError(f"quality gate failed: {rep.failures}")

    daily, d_obs = quality.with_observed_metrics(silver_daily(silver), "daily_obs")
    hourly, h_obs = quality.with_observed_metrics(silver_hourly(silver), "hourly_obs")

    def write_gold(df: DataFrame, name: str):
        def act():
            df.write.mode("overwrite").parquet(os.path.join(out_dir, name))
            return df, None

        return act

    staged("gold_daily", write_gold(daily, "daily_weather_summary"))
    staged("gold_hourly", write_gold(hourly, "hourly_weather_summary"))
    checkpointing.release(silver)  # all five consumers have run

    audit = audits[0]
    for a in audits[1:]:
        audit = audit.unionByName(a)
    return PipelineResult(
        silver_rows=int(s_obs.get["n_rows"]),
        daily_rows=int(d_obs.get["n_rows"]),
        hourly_rows=int(h_obs.get["n_rows"]),
        quality=rep,
        audit=audit,
    )


def stream_silver(
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    cities: Sequence[str] = rest.DEFAULT_CITIES,
    start_epoch: int = 1_700_000_000,
    interval: int = 3600,
):
    """Streaming twin of the batch silver flow (SURVEY §7 step 9: same
    transformations under foreachBatch): REST poll stream → to_silver →
    idempotent append keyed on (city, timestamp). At-least-once delivery
    from the source + key-dedup at the sink = effectively-once silver —
    the reference's S8+P4+UNIQUE-index contract in engine form.

    Returns the started StreamingQuery (caller stops it / awaits)."""
    from .streaming import sinks

    stream = rest.stream_weather(spark, cities, start_epoch, interval)

    def write_batch(batch_df: DataFrame, _epoch: int) -> None:
        silver = to_silver(batch_df)
        sinks.idempotent_append_batch(silver, out_dir, keys=["city", "timestamp"])

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
