"""Derived-column operators P7-P10 (SURVEY §2.B) — pure column math.

  P7  arithmetic derived column  (temp_range, silver_processor.py:243)
  P8  formula column (heat index, silver_processor.py:255-264)
  P9  boolean flag from set membership (is_weekend, silver_processor.py:242)
  P10 boolean flag from interval containment (is_day, silver_processor.py:245-251)

All Catalyst expressions — no UDFs — so they fold into the same
whole-stage-codegen span as the surrounding projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def col_range(hi: str | Column, lo: str | Column) -> Column:
    """P7 — spread between two measure columns (temp_range = max - min,
    silver_processor.py:243)."""
    hi = F.col(hi) if isinstance(hi, str) else hi
    lo = F.col(lo) if isinstance(lo, str) else lo
    return hi - lo


def heat_index(temperature: str | Column, humidity: str | Column) -> Column:
    """P8 — reference's simplified heat index:
    ``temperature + 0.5555 * (humidity/100 - 1)``
    (silver_processor.py:255-264)."""
    t = F.col(temperature) if isinstance(temperature, str) else temperature
    h = F.col(humidity) if isinstance(humidity, str) else humidity
    return t + F.lit(0.5555) * (h / F.lit(100.0) - F.lit(1.0))


def flag_in_set(col: str | Column, members: list) -> Column:
    """P9 — boolean membership flag (is_weekend = dow IN (1,7),
    silver_processor.py:242)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(members)


def flag_between_cols(ts: str | Column, lo: str | Column, hi: str | Column) -> Column:
    """P10 — interval containment against two *columns*
    (is_day = sunrise <= ts <= sunset, silver_processor.py:245-251)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    lo = F.col(lo) if isinstance(lo, str) else lo
    hi = F.col(hi) if isinstance(hi, str) else hi
    return (ts >= lo) & (ts <= hi)
