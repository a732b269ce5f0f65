"""Expectation-suite properties: injected violations are counted
exactly, NULL conventions hold, and the row-level block compiles to
ONE scan no matter how many checks it carries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark import plans
from data_mastery_pipeline_spark.operators import expectations as X


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        # (id, key, status, amount)
        (1, 10, "O", 50.0),
        (2, 10, "F", -1.0),   # range violation
        (3, 20, "X", 10.0),   # accepted_values violation
        (4, None, "O", 20.0),  # null key
        (5, 30, None, 30.0),  # null status -> accepted_values violation
        (5, 40, "P", 40.0),   # duplicate id
    ]
    return spark.createDataFrame(rows, ["id", "key", "status", "amount"])


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(10,), (30,), (40,)], ["k"])


def test_counts_exact(spark, facts, dim):
    suite = [
        X.not_null("key_not_null", "key"),
        X.accepted_values("status_ok", "status", ["O", "F", "P"]),
        X.in_range("amount_range", "amount", 0, 100),
        X.UniqueCheck("unique_id", ("id",)),
        X.ReferentialCheck("fk_key", ("key",), dim, ("k",)),
    ]
    out = {
        r["check_name"]: (r["violations"], r["passed"])
        for r in X.run_suite(facts, suite).collect()
    }
    assert out["key_not_null"] == (1, False)
    assert out["status_ok"] == (2, False)      # 'X' + NULL status
    assert out["amount_range"] == (1, False)   # -1.0
    assert out["unique_id"] == (1, False)      # id=5 twice
    # key=20 orphan + NULL key never matches -> 2
    assert out["fk_key"] == (2, False)


def test_all_green_suite(spark, facts, dim):
    suite = [
        X.in_range("amount_range_wide", "amount", -100, 100),
        X.UniqueCheck("unique_rowid", ("id", "key")),
    ]
    out = X.run_suite(facts, suite).collect()
    assert all(r["passed"] for r in out)
    assert all(r["violations"] == 0 for r in out)


def test_row_checks_share_one_scan(spark):
    """8 row-level checks over a parquet table = exactly ONE file scan
    (scan_count counts file sources, hence the parquet-backed input)."""
    from data_mastery_pipeline_spark.tables import load_table
    from conftest import SF_SMOKE

    orders = load_table(spark, "orders", SF_SMOKE)
    suite = [X.not_null(f"c{i}", "o_custkey") for i in range(8)]
    df = X.run_suite(orders, suite)
    assert plans.inspect.scan_count(df) == 1


def test_unique_on_empty_and_all_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "id: int")
    out = X.run_suite(df, [X.UniqueCheck("u", ("id",))]).collect()
    # NULL keys are not uniqueness violations (not_null's business)
    assert out[0]["violations"] == 0 and out[0]["passed"]
