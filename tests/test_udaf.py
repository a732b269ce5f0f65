"""GROUPED_AGG pandas UDF (UDAF surface, SURVEY §2.K): the Arrow-batched
trimmed mean equals the native percentile+filter+avg computation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_mastery_pipeline_spark.functions.udafs import trimmed_mean_10
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_SMOKE


def test_trimmed_mean_udaf_matches_native_two_step(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    # inject null values so the null contract is actually exercised
    # (the raw corpus has none): both implementations trim over the
    # NON-NULL values only
    ev = ev.withColumn(
        "value", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    )
    got = {
        r["event_type"]: r["tm"]
        for r in ev.groupBy("event_type")
        .agg(trimmed_mean_10()("value").alias("tm"))
        .collect()
    }

    # native two-step: drop nulls FIRST (matching the UDAF's dropna),
    # then per-group rank bounds, filter the tails, average
    from pyspark.sql import Window

    ev = ev.filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    n = F.count("*").over(Window.partitionBy("event_type"))
    rn = F.row_number().over(w)
    cut = F.floor(n * 0.1)
    core = ev.withColumn("rn", rn).withColumn("n", n).withColumn("cut", cut).filter(
        (F.col("rn") > F.col("cut")) & (F.col("rn") <= F.col("n") - F.col("cut"))
    )
    want = {
        r["event_type"]: r["tm"]
        for r in core.groupBy("event_type").agg(F.avg("value").alias("tm")).collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), k
    # trimming matters: trimmed mean differs from the plain mean somewhere
    plain = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
    }
    assert any(not math.isclose(got[k], plain[k], rel_tol=1e-9) for k in got)


def test_trimmed_mean_udaf_all_null_group_returns_null(spark):
    """Native-aggregate parity for the empty case: an all-null group
    yields NULL (as avg/sum would), never NaN — NaN breaks joins,
    comparisons, and groupBy in ways NULL doesn't (ADVICE r04)."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None)],
        "grp string, value double",
    )
    # (a GROUPED_AGG pandas UDF can't share an agg() with native
    # aggregates — INVALID_PANDAS_UDF_PLACEMENT — so two passes)
    udaf = {
        r["grp"]: r["tm"]
        for r in df.groupBy("grp").agg(trimmed_mean_10()("value").alias("tm")).collect()
    }
    native = {
        r["grp"]: r["m"]
        for r in df.groupBy("grp").agg(F.avg("value").alias("m")).collect()
    }
    assert udaf["a"] == 2.0
    assert udaf["b"] is None, "all-null group must be NULL, not NaN"
    assert native["b"] is None  # the contract being mirrored


def test_trimmed_mean_udaf_drops_nan_values(spark):
    """NaN contract (review r6, 10th pass): Arrow maps Spark NULL to
    NaN in the float64 Series, so dropna removes BOTH — a data NaN is
    dropped like a null, never propagated into the mean. The docstring
    states this; this test pins it."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", float("nan")), ("a", 3.0), ("b", float("nan"))],
        "grp string, value double",
    )
    got = {
        r["grp"]: r["tm"]
        for r in df.groupBy("grp").agg(trimmed_mean_10()("value").alias("tm")).collect()
    }
    assert got["a"] == 2.0          # mean(1, 3) — the NaN is dropped
    assert got["b"] is None         # all-NaN group → NULL, like all-null
