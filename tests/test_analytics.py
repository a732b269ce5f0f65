"""Invariant tests for the round-4 analytics operators.

Oracle parity proves engine-vs-engine value equality; these pin the
MATHEMATICAL invariants the operators promise, so a future edit that
breaks both sides identically (the failure oracle parity cannot see)
still fails loudly.
"""

from __future__ import annotations

import math

import data_mastery_pipeline_spark.queries_ext  # noqa: F401
import data_mastery_pipeline_spark.queries_stats  # noqa: F401
from data_mastery_pipeline_spark.registry import QUERIES

from conftest import SF_SMOKE


def test_funnel_stages_monotone(spark):
    row = QUERIES["funnel_conversion"](spark, SF_SMOKE).collect()[0]
    assert row["n_view"] >= row["n_click_after_view"] >= row["n_purchase_after_click"]
    assert row["n_purchase_after_click"] >= 0


def test_kl_drift_nonnegative(spark):
    rows = QUERIES["source_unigram_drift"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # KL(P‖Q) ≥ 0 always; quantization can only dip it one quantum
        assert r["kl_vs_corpus"] >= -1e-4, r


def test_lm_logprob_negative_and_bounded(spark):
    rows = QUERIES["lm_bigram_quality"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # log of a probability: strictly negative, and never below
        # ln(k / (max_count + k·V)) — use a loose floor
        assert -50.0 < r["avg_logprob"] < 0.0, r
        assert r["n_bigrams"] >= 1


def test_revenue_concentration_shares_form_a_distribution(spark):
    rows = QUERIES["revenue_concentration"](spark, SF_SMOKE).collect()
    shares = {r["decile"]: r["revenue_share"] for r in rows}
    assert set(shares) == set(range(1, 11))
    assert math.isclose(sum(shares.values()), 1.0, abs_tol=1e-3)
    # deciles are ordered by spend: the top decile outearns the bottom
    assert shares[1] >= shares[10]


def test_rfm_buckets_partition_customers(spark):
    rows = QUERIES["rfm_segments"](spark, SF_SMOKE).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_bucket", "f_bucket", "m_bucket"):
        vals = [r[col] for r in rows]
        assert set(vals) <= set(range(1, 6))
        # ntile balance: bucket sizes differ by at most 1
        sizes = [vals.count(b) for b in sorted(set(vals))]
        assert max(sizes) - min(sizes) <= 1, (col, sizes)


def test_user_value_runs_reconstruct_the_stream(spark):
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.tables import load_table

    runs = QUERIES["user_value_runs"](spark, SF_SMOKE)
    ev = load_table(spark, "events", SF_SMOKE).filter(F.col("value").isNotNull())
    # partition of the stream: run event counts sum to the row count
    assert runs.agg(F.sum("n_events")).first()[0] == ev.count()
    rows = runs.collect()
    for r in rows:
        assert r["valid_from"] <= r["last_seen"]
    # adjacent runs of one user always change bucket (that's what makes
    # them runs)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for seq in by_user.values():
        seq.sort(key=lambda r: r["run_id"])
        for a, b in zip(seq, seq[1:]):
            assert a["value_bucket"] != b["value_bucket"], (a, b)
            assert a["last_seen"] <= b["valid_from"]


def test_event_path_trigrams_support_cut(spark):
    rows = QUERIES["event_path_trigrams"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n"] >= 5
        assert r["e1"] and r["e2"] and r["e3"]


def test_part_cooccurrence_symmetric_support(spark):
    rows = QUERIES["part_cooccurrence"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_orders"] >= 2


def test_anomaly_zscores_match_flags(spark):
    rows = QUERIES["daily_revenue_anomalies"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # flag consistent with the (quantized) z-score within a quantum
        if abs(r["z"]) > 3.001:
            assert r["is_anomaly"], r
        if abs(r["z"]) < 2.999:
            assert not r["is_anomaly"], r


def test_profile_empty_table_reports_zero_nulls(spark):
    """profile() on an EMPTY table: n_rows/n_null/n_distinct are 0 (not
    null — 'no rows' means zero nulls, not unknown), min/max null."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.operators import profile as prof

    df = spark.range(5).select(
        F.col("id").alias("a"), F.lit("x").alias("b")
    ).filter(F.lit(False))
    rows = {r.column: r for r in prof.profile(df).collect()}
    assert set(rows) == {"a", "b"}
    for r in rows.values():
        assert r.n_rows == 0 and r.n_null == 0 and r.n_distinct == 0
        assert r.min_value is None and r.max_value is None
