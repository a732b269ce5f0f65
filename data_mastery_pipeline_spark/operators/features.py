"""Feature-store point-in-time joins (leakage-safe feature serving).

The training-data twin of operators/joins.py's as-of join: a LABEL
relation (entity, label_ts) must pick up, for each row, feature values
computed from events STRICTLY BEFORE label_ts — never at or after it
(that is target leakage) — and optionally no older than a staleness
horizon (a feature too stale to have been served online is a
train/serve skew bug). This is the "time travel join" every feature
platform ships (Feast / the point-in-time-correctness literature).

Spark-first shape — ONE union + ONE window pass, no per-feature joins:

- Tag feature events weight=1 and append the label probes weight=0,
  then sort each entity's partition once by event time. Every feature
  is a window aggregate over that single sorted pass:

  * interval counts/sums → ``RANGE BETWEEN -horizon AND -1`` on the
    microsecond epoch (the −1 upper bound IS the strictness: rows at
    the label's own timestamp are excluded, so a feature computed from
    the label event itself can never leak in);
  * "latest value as of" with staleness → ``max_by(value, ts)`` over
    the same range frame bounded at the staleness horizon — NULL when
    nothing in-horizon exists, which is exactly what the online store
    would have served.

  Probes carry weight 0, so label rows never contaminate each other's
  features even when several labels share an entity.

- Cost at 100 TB: one shuffle on entity id (the window partition key),
  one sort per partition, zero joins. N additional features are N more
  window expressions over the SAME sorted pass — the marginal feature
  is free, which is the whole point versus N as-of joins.

Skewed entities (one user with 10⁸ events) bound the partition sort;
the standard fix is time-bucketing the partition key (entity, month)
with horizon-sized overlap — noted here, not needed at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def point_in_time_features(
    events: DataFrame,
    labels: DataFrame,
    entity_col: str,
    ts_col: str,
    count_horizon_days: int,
    value_col: str,
    value_event_filter,
    value_staleness_days: int,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Attach point-in-time features to each label row.

    ``labels`` must be a subset-projection of ``events`` rows (entity,
    ts, plus ``carry_cols`` — label id columns carried through to the
    output untouched). Returns one row per label with:

    - ``evt_{h}d``: count of feature events in
      ``[label_ts − h days, label_ts)`` for the label's entity;
    - ``last_{value_col}``: latest ``value_col`` among events matching
      ``value_event_filter`` in the staleness window
      ``[label_ts − staleness, label_ts)``, else NULL.
    """
    us = F.unix_micros(F.col(ts_col))
    feat = events.select(
        F.col(entity_col).alias("__ent"),
        us.alias("__us"),
        F.lit(1).alias("__w"),
        F.when(value_event_filter, F.col(value_col)).alias("__fv"),
        F.when(value_event_filter, us).alias("__fts"),
        F.lit(False).alias("__probe"),
        *[
            F.lit(None).cast(labels.schema[c].dataType).alias(c)
            for c in carry_cols
        ],
    )
    probe = labels.select(
        F.col(entity_col).alias("__ent"),
        us.alias("__us"),
        F.lit(0).alias("__w"),
        F.lit(None).cast(events.schema[value_col].dataType).alias("__fv"),
        F.lit(None).cast("long").alias("__fts"),
        F.lit(True).alias("__probe"),
        *[F.col(c) for c in carry_cols],
    )
    w_count = (
        Window.partitionBy("__ent")
        .orderBy("__us")
        .rangeBetween(-count_horizon_days * US_PER_DAY, -1)
    )
    w_val = (
        Window.partitionBy("__ent")
        .orderBy("__us")
        .rangeBetween(-value_staleness_days * US_PER_DAY, -1)
    )
    out = (
        feat.unionByName(probe)
        .withColumn(
            f"evt_{count_horizon_days}d",
            F.coalesce(F.sum("__w").over(w_count), F.lit(0)).cast(
                "bigint"
            ),
        )
        .withColumn(
            # ordering is (ts, value): two qualifying feature events at
            # the SAME timestamp must resolve deterministically (max
            # value wins) or engine parity flaps — same convention as
            # ohlc_hourly's composite first/last key. Non-feature rows
            # carry struct(NULL, NULL), which sorts below every real
            # event; an all-NULL frame yields NULL (nothing to serve).
            f"last_{value_col}",
            F.max_by("__fv", F.struct("__fts", "__fv")).over(w_val),
        )
        .filter(F.col("__probe"))
        .drop("__w", "__fv", "__fts", "__probe")
        .withColumnRenamed("__ent", entity_col)
        .withColumnRenamed("__us", "label_us")
    )
    return out
