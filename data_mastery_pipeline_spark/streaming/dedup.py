"""Streaming dedup — the watermarked twin of batch P4/S14.

The reference absorbs Kafka replays with batch dropDuplicates + a
serving-side UNIQUE index (silver_processor.py:191, schema.sql:86).
``dropDuplicatesWithinWatermark`` is the streaming-native form: state
holds one entry per key only until the watermark passes it, so state is
bounded by (key cardinality within the delay window) — the property
that makes dedup feasible on an unbounded 100 TB/day stream, where an
unbounded-state ``dropDuplicates`` would OOM.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_within_watermark(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys whose copies arrive within ``delay`` of each
    other (guaranteed); copies farther apart MAY both survive — the
    documented contract, matching at-least-once replay distance."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))
