"""Exact deduplication — hash-groupBy on a content fingerprint.

Scale: one shuffle on the fingerprint (a uniform 128-bit key — no skew),
min() as the deterministic keep-policy. At 100 TB the fingerprint
aggregate is the cheapest possible dedup: map-side partial min per
fingerprint, tiny final shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import content_fingerprint


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Add the canonical content fingerprint (md5 of sorted distinct
    tokens — collides for reshuffled/duplicated-word copies)."""
    return df.withColumn(out_col, content_fingerprint(text_col))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per fingerprint (deterministic).

    NULL-text documents all pass through: their fingerprint is NULL and
    window partitioning groups NULL keys together like GROUP BY, so
    without the null guard 100 distinct no-text documents would collapse
    to one survivor — silent data loss, and a NULL fingerprint asserts
    nothing about content equality (review r6)."""
    fp = with_fingerprint(df, text_col)
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col))
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) | F.col("fingerprint").isNull())
        .drop("__rn", "fingerprint")
    )


def dup_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Dedup summary per fingerprint-duplicate group: group size and the
    kept (min) id. Groups of size 1 are unique documents. ``id_col``
    matches the sibling ``exact_dedup`` (review r6: it was hardcoded).
    NULL-text documents are excluded — a NULL fingerprint is not a
    duplicate GROUP (exact_dedup keeps every such row; counting them as
    one n_copies group would claim duplicates that aren't)."""
    fp = with_fingerprint(df, text_col).filter(F.col("fingerprint").isNotNull())
    return fp.groupBy("fingerprint").agg(
        F.count("*").alias("n_copies"),
        F.min(id_col).alias("keep_doc_id"),
    )
