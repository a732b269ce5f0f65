"""Event-time windowed aggregations — tumbling / sliding / session.

The reference computes its hourly/daily aggregates in batch on derived
y/m/d/h key columns (silver_processor.py:279-304, SURVEY A1/A2); these
are the same aggregations expressed as true event-time windows, so one
function serves batch backfill AND the streaming path. Watermarks bound
state (the reference has none — late rows just land in the next batch
run, SURVEY §2.J) and enable append-mode emission of closed windows.

State-size discipline at 100 TB: window state is keyed by
(group keys × open windows); the watermark delay is the knob bounding
open windows, and session windows additionally merge — skewed keys
(one user with millions of events) are the hazard, mitigated by the
watermark plus AQE skew handling on the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    # Batch frames ignore watermarks semantically, but only streaming
    # frames require them; keep one code path.
    return df.withWatermark(ts_col, watermark) if watermark else df


def tumbling_value_stats(
    df: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-event_type tumbling-window count/sum — streaming twin of the
    reference's hourly aggregate (A2, silver_processor.py:293-304)."""
    out = (
        _maybe_watermark(df, ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
    )


def sliding_value_stats(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window stats: each event lands in window/slide overlapping
    windows (Spark expands to one row per covering window before the
    hash aggregate — partial aggregation still applies)."""
    out = (
        _maybe_watermark(df, ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n_events"
    )


def session_value_stats(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per key (gap-based merge): one row per burst of
    activity separated by ≥gap of silence. Spark merges overlapping
    candidate sessions in the aggregation state."""
    out = (
        _maybe_watermark(df, ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        key_col,
        "n_events",
        "sum_value",
    )
