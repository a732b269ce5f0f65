"""Date/time scalar functions D1-D14 (SURVEY §2.C).

Every function the reference uses maps to a native Spark function
(silver_processor.py:235-241, schema.sql:106,151-153,245-264,
gold_loader.py:130,158). ``time_parts`` is the bundled projection the
Silver stage applies before aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

# D1-D7: calendar part extractors keyed by output column name.
TIME_PART_FNS = {
    "year": F.year,          # D1
    "month": F.month,        # D2
    "day": F.dayofmonth,     # D3
    "hour": F.hour,          # D4
    "day_of_week": F.dayofweek,  # D5 (1=Sunday, Spark == Postgres DOW+1 convention used by reference)
    "week_of_year": F.weekofyear,  # D6
    "quarter": F.quarter,    # D7
}


def time_parts(df: DataFrame, ts_col: str, parts: list[str] | None = None) -> DataFrame:
    """D1-D7 — add calendar-part columns derived from ``ts_col``
    (silver_processor.py:235-241)."""
    parts = parts or list(TIME_PART_FNS)
    return df.withColumns({p: TIME_PART_FNS[p](F.col(ts_col)) for p in parts})


def iso_to_timestamp(col: str | Column) -> Column:
    """D8 — ISO-8601 string → timestamp (silver_processor.py:170-174)."""
    return F.to_timestamp(col)


def epoch_to_timestamp(col: str | Column) -> Column:
    """D9 — epoch seconds → timestamp (weather_producer.py:107,120-121)."""
    return F.timestamp_seconds(col)


def to_date_trunc(col: str | Column) -> Column:
    """D10 — DATE(ts) truncation (schema.sql:245,251)."""
    return F.to_date(col)


def make_date(y: Column, m: Column, d: Column) -> Column:
    """D11 — construct a date from parts (schema.sql:106)."""
    return F.make_date(y, m, d)


def make_hour_timestamp(y: Column, m: Column, d: Column, h: Column) -> Column:
    """D12 — construct an hour-grain timestamp (schema.sql:151-153)."""
    return F.make_timestamp(y, m, d, h, F.lit(0), F.lit(0))


def retention_cutoff(days: int) -> Column:
    """D13 — ``now() - INTERVAL days`` retention boundary (schema.sql:264)."""
    return F.current_timestamp() - F.expr(f"INTERVAL {int(days)} DAYS")


def duration_seconds(start: str | Column, end: str | Column) -> Column:
    """D14 — EXTRACT(EPOCH FROM (end-start)) (gold_loader.py:130,158).

    Microsecond-exact (review r6, verified): ``unix_timestamp()``
    TRUNCATES each endpoint to whole seconds before subtracting, so
    sub-second timestamps were off by up to ±1 s vs the EPOCH semantic
    — the same pitfall operators/joins.py:171 documents and avoids."""
    return (F.unix_micros(end) - F.unix_micros(start)) / F.lit(1_000_000.0)
