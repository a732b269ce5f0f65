"""Streaming queries — Structured Streaming runs registered in the
driver contract (SURVEY §2.J, §7 step 9).

Each query REALLY executes a streaming job: ``readStream`` over the
events parquet → watermarked transformation → memory sink drained with
``availableNow`` — then returns the sink table as a batch DataFrame, so
the DuckDB oracle checks true streaming output, not a batch stand-in.

Determinism notes: with a finite input, complete-mode aggregations are
exactly the batch result; update/append-mode operators are deterministic
here because the file source delivers the (single) input file in one
micro-batch, making stream state = global state. Multi-batch semantics
(watermark advance, late-data drop, cross-batch state) are exercised in
tests/test_streaming.py, where input is split into many files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import quantize, query
from .schemas import EVENTS
from .streaming import core, dedup as sdedup, kafka, stateful, windows as swin
from .streaming import joins as sjoins
from .tables import load_table

# JSON timestamp format carrying full µs precision for the Kafka
# round-trip (one definition: streaming.kafka.TS_FMT_MICROS).
_TS_FMT = kafka.TS_FMT_MICROS


@query(
    "stream_tumbling_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling windows over the event stream
    (complete mode) — the streaming twin of hourly_agg (A2)."""
    ev = core.stream_events(spark, sf_dir)
    out = swin.tumbling_value_stats(ev, window="1 hour", watermark="1 hour")
    res = core.run_available_now(out, output_mode="complete", shuffle_partitions=8)
    return res.select(
        "window_start", "event_type", "n_events", quantize(F.col("sum_value"), "sum_value")
    )


@query(
    "stream_sliding_halfhour",
    """
    WITH starts AS (
        SELECT event_type,
               unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
                   AS window_start
        FROM events
    )
    SELECT window_start, event_type, count(*) AS n_events
    FROM starts GROUP BY 1, 2
    """,
)
def stream_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event covered by
    exactly two windows; the oracle enumerates both covering starts)."""
    ev = core.stream_events(spark, sf_dir)
    out = swin.sliding_value_stats(
        ev, window="1 hour", slide="30 minutes", watermark="1 hour"
    )
    return core.run_available_now(out, output_mode="complete", shuffle_partitions=8)


@query(
    "stream_session_30m",
    """
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        -- same (ts, event_id) order as the flag window: on timestamp
        -- ties the running sum must see the is_new=1 row FIRST, or a
        -- same-ts peer lands in the previous island — a session split
        -- Spark's pure time-range merge can never produce (review r6)
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           count(*) AS n_events,
           floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value
    FROM islands GROUP BY user_id, island
    """,
)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (30-min inactivity closes a
    session; Spark merges overlapping candidates in state). Oracle:
    gaps-and-islands — session_end = last event + gap, matching Spark's
    session_window definition."""
    ev = core.stream_events(spark, sf_dir)
    out = swin.session_value_stats(ev, gap="30 minutes", watermark="1 hour")
    res = core.run_available_now(out, output_mode="complete", shuffle_partitions=8)
    return res.select(
        "session_start",
        "session_end",
        "user_id",
        "n_events",
        quantize(F.col("sum_value"), "sum_value"),
    )


@query(
    "stream_dedup_keys",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over the stream, projected to the
    key columns (whichever copy survives, the key set is deterministic).
    Single-batch input ⇒ equals global DISTINCT; the watermark bound is
    exercised multi-batch in tests. NO trailing distinct: the operator
    under test must produce the unique key set ITSELF — a safety-net
    distinct here would make the oracle check vacuous (a broken dedup
    emitting every duplicate would still pass; review r6)."""
    ev = core.stream_events(spark, sf_dir).select("ts", "user_id", "event_type")
    out = sdedup.dedup_within_watermark(
        ev, ["user_id", "event_type"], ts_col="ts", delay="30 days"
    )
    res = core.run_available_now(out, output_mode="append", shuffle_partitions=8)
    return res.select("user_id", "event_type")


@query(
    "stream_user_sessions",
    """
    WITH flagged AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    )
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged GROUP BY 1
    """,
)
def stream_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    session/event counters carried across micro-batches. Update-mode
    rows per batch; with one batch the final row per user is the total."""
    ev = core.stream_events(spark, sf_dir).select("ts", "user_id")
    # TTL off: availableNow drains never terminate under processing-time
    # timers (see sessionize_users docstring); production streams keep it.
    out = stateful.sessionize_users(ev, state_ttl_ms=None)
    res = core.run_available_now(out, output_mode="update", shuffle_partitions=8)
    return res


@query(
    "kafka_roundtrip",
    """
    SELECT event_id, ts, user_id, event_type,
           floor((value) * 10000 + 0.5) / 10000.0 AS value,
           0 AS _kafka_partition
    FROM events
    """,
)
def kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3→S4→S2 parity: events → keyed JSON Kafka records (binary
    key/value + topic/partition/offset metadata, the exact shape
    ``format("kafka")`` yields) → parse back to typed rows with
    µs-precision timestampFormat both ways. The oracle is the identity —
    proving serialize/parse loses nothing."""
    fmt = {"timestampFormat": _TS_FMT}
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    pair = kafka.to_kafka_records(ev, key_col="user_id", json_options=fmt)
    records = pair.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )
    payload_schema = T.StructType([f for f in EVENTS.fields if f.name != "props"])
    parsed = kafka.parse_json_records(records, payload_schema, json_options=fmt)
    return parsed.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        quantize(F.col("value"), "value", 4),
        "_kafka_partition",
    )


@query(
    "stream_interval_join",
    """
    SELECT c.user_id AS click_user, c.ts AS click_ts, p.ts AS purchase_ts
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT ts FROM events WHERE event_type = 'purchase') p
      ON p.ts BETWEEN c.ts - INTERVAL 2 MINUTE AND c.ts + INTERVAL 2 MINUTE
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join — purchases within ±2 min of any
    click, both sides unbounded streams (the streaming twin of
    clicks_near_purchases). Watermarks on BOTH sides bound the join
    state: a buffered click can be evicted once the purchase watermark
    passes click_ts + 2 min (Spark derives the eviction bound from the
    time-range condition). Without them, each side would buffer its
    whole history — the unbounded-state trap of stream-stream joins.

    Spark REFUSES stream-stream joins with no equality predicate (state
    would be all-pairs); the same time-bucket blocking as the batch
    operator supplies one (streaming/joins.py::interval_join_streams).

    A pre-flight density probe (streaming/joins.py::check_interval_fanout)
    guards the fan-out: round 3's collapsed-timestamp testdata silently
    inflated this join's output 1000×; now that input shape raises."""
    sjoins.check_interval_fanout(
        load_table(spark, "events", sf_dir).filter(
            F.col("event_type") == "purchase"
        ),
        "ts",
        tolerance_seconds=120,
    )
    clicks = (
        core.stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("click_user"), F.col("ts").alias("click_ts"))
    )
    purchases = (
        core.stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("ts").alias("purchase_ts"))
    )
    joined = sjoins.interval_join_streams(
        clicks, purchases, "click_ts", "purchase_ts", tolerance_seconds=120
    ).select("click_user", "click_ts", "purchase_ts")
    return core.run_available_now(joined, output_mode="append", shuffle_partitions=8)
