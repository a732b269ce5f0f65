"""Quality-gate tests (SURVEY §2.L Q1-Q5): the single-pass check harness
on real tables, pass and fail paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mastery_pipeline_spark.operators import quality
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_ORACLE


def test_clean_table_passes(spark):
    ev = load_table(spark, "events", SF_ORACLE)
    rep = quality.check_quality(
        ev,
        key_cols=["event_id"],
        null_checked=["user_id", "ts", "value"],
        range_checks=[("value", -1e6, 1e6)],
    )
    assert rep.passed, rep.failures
    assert rep.n_rows == ev.count()
    assert rep.n_duplicate_keys == 0
    assert all(pct == 0.0 for pct in rep.null_pct.values())


def test_null_threshold_fails(spark):
    ev = load_table(spark, "events", SF_ORACLE).withColumn(
        "maybe", F.when(F.col("value") < 300, None).otherwise(F.col("value"))
    )
    rep = quality.check_quality(
        ev, key_cols=[], null_checked=["maybe"], null_pct_max=0.10
    )
    assert not rep.passed
    assert any("null pct" in f for f in rep.failures)


def test_duplicate_keys_fail(spark):
    ev = load_table(spark, "events", SF_ORACLE)
    rep = quality.check_quality(
        ev, key_cols=["user_id"], null_checked=[]  # user_id repeats heavily
    )
    assert not rep.passed
    assert rep.n_duplicate_keys > 0


def test_range_violations_counted(spark):
    ev = load_table(spark, "events", SF_ORACLE)
    lo, hi = 0.0, 100.0
    rep = quality.check_quality(
        ev, key_cols=[], null_checked=[], range_checks=[("value", lo, hi)]
    )
    expected = ev.filter(~F.col("value").between(lo, hi)).count()
    assert rep.n_range_violations == expected
    assert (expected > 0) == (not rep.passed)


def test_empty_dataset_fails(spark):
    ev = load_table(spark, "events", SF_ORACLE).filter(F.lit(False))
    rep = quality.check_quality(ev, key_cols=[], null_checked=[])
    assert not rep.passed
    assert "empty dataset" in rep.failures


def test_observed_metrics_piggyback_on_the_action(spark):
    """observe() yields row/null counts from the SAME job as the real
    action — the scale-correct replacement for the reference's
    count()-per-stage pattern (silver_processor.py:148,198,326)."""
    from data_mastery_pipeline_spark.operators.quality import with_observed_metrics
    from data_mastery_pipeline_spark.tables import load_table
    from conftest import SF_ORACLE

    ev = load_table(spark, "events", SF_ORACLE).select("event_id", "user_id", "props")
    observed, obs = with_observed_metrics(ev, "ev_metrics", value_cols=["props"])
    # one real action (the pipeline's own write/agg); metrics ride along
    n_out = observed.filter(F.col("user_id").isNotNull()).count()
    got = obs.get
    assert got["n_rows"] == ev.count()  # observed BEFORE the filter
    assert got["null_props"] == ev.filter(F.col("props").isNull()).count()
    assert n_out <= got["n_rows"]
