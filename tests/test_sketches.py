"""Count-Min properties: one-sided error, the εN bound on this corpus,
and mergeability (sketch(A ∪ B) == merge(sketch(A), sketch(B)))."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.functions import text as textfn
from data_mastery_pipeline_spark.operators import sketches
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_SMOKE

D, W = 4, 256


@pytest.fixture(scope="module")
def toks(spark):
    docs = load_table(spark, "documents", SF_SMOKE)
    return docs.select(
        "doc_id", F.explode(textfn.tokens("text")).alias("tok")
    ).localCheckpoint()


def test_estimates_never_undercount_and_respect_eps_bound(spark, toks):
    counters = sketches.countmin_counters(toks, "tok", D, W)
    truth = toks.groupBy("tok").agg(F.count("*").alias("n"))
    est = sketches.countmin_estimate(counters, truth, "tok", D, W)
    j = truth.join(est, "tok").toPandas()
    n_total = int(j["n"].sum())
    assert (j["cm_est"] >= j["n"]).all()
    # CM guarantee: P[overshoot > (e/w)·N] ≤ e^-d per key. With d=4
    # that is ~1.8% per key — assert the 99th-percentile overshoot
    # stays inside the bound rather than the max (the bound is
    # probabilistic; the corpus is fixed and seeded, so this is a
    # stable regression pin, not a flaky tail assert).
    bound = (2.718281828 / W) * n_total
    overshoot = (j["cm_est"] - j["n"]).to_numpy()
    assert (overshoot <= bound).mean() >= 0.98


def test_counter_table_is_bounded(spark, toks):
    counters = sketches.countmin_counters(toks, "tok", D, W).toPandas()
    assert len(counters) <= D * W
    assert set(counters["i"]) == set(range(D))
    assert counters["bucket"].between(0, W - 1).all()
    # every row of the sketch holds the full stream's weight
    per_row = counters.groupby("i")["c"].sum()
    assert per_row.nunique() == 1


def test_sketches_merge_by_cell_sum(spark, toks):
    a = toks.filter(F.col("doc_id") % 2 == 0)
    b = toks.filter(F.col("doc_id") % 2 == 1)
    whole = sketches.countmin_counters(toks, "tok", D, W).toPandas()
    ca = sketches.countmin_counters(a, "tok", D, W)
    cb = sketches.countmin_counters(b, "tok", D, W)
    merged = (
        ca.unionByName(cb)
        .groupBy("i", "bucket")
        .agg(F.sum("c").alias("c"))
        .toPandas()
    )
    key = ["i", "bucket"]
    m = pd.merge(
        whole.sort_values(key).reset_index(drop=True),
        merged.sort_values(key).reset_index(drop=True),
        on=key,
        how="outer",
        suffixes=("_w", "_m"),
    )
    assert (m["c_w"] == m["c_m"]).all()


def test_probe_for_absent_key_reads_collision_mass_only(spark, toks):
    counters = sketches.countmin_counters(toks, "tok", D, W)
    probes = spark.createDataFrame(
        [("zz-never-in-corpus-zz",)], ["tok"]
    )
    est = sketches.countmin_estimate(counters, probes, "tok", D, W)
    rows = est.collect()
    # inner join: a fully-empty cell row drops out; if present, the
    # estimate is pure collision mass and still ≥ the true count (0)
    assert len(rows) <= 1
    if rows:
        assert rows[0]["cm_est"] >= 0


def test_absent_key_estimates_zero_not_missing(spark):
    """A probe key whose cells are all empty must return est=0 (and a
    key sharing SOME empty cell must take the zero into its min) — the
    inner-join form dropped empty cells from the min entirely."""
    stream = spark.createDataFrame([("aaa",)] * 5, "tok string")
    counters = sketches.countmin_counters(stream, "tok", D, W)
    probes = spark.createDataFrame(
        [("aaa",), ("never-seen-key",)], "tok string"
    )
    est = {
        r["tok"]: r["cm_est"]
        for r in sketches.countmin_estimate(
            counters, probes, "tok", D, W
        ).collect()
    }
    assert est["aaa"] == 5
    # present in the output, and exactly zero: with one distinct
    # stream key only 4 of 1024 cells are non-empty, so every probe
    # hash row of the unseen key lands on an empty cell
    assert est["never-seen-key"] == 0
