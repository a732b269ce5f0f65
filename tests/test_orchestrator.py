"""Stage-DAG orchestrator (orchestrator.py): the reference's Airflow
operational semantics — retries, transitive downstream skip,
deterministic topological order, malformed-DAG rejection — plus the
golden weather DAG end-to-end."""

from __future__ import annotations

import pytest

from data_mastery_pipeline_spark import orchestrator as orch


def _audit_map(df):
    return {
        r["stage"]: (r["status"], r["attempts"], r["rows_processed"])
        for r in df.collect()
    }


def test_retry_failure_and_transitive_skip(spark):
    calls = {"n": 0}

    def flaky(_ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok", 1

    def boom(_ctx):
        raise RuntimeError("hard")

    def passthrough(ctx):
        return ctx["flaky"], 5

    stages = [
        orch.Stage("flaky", flaky, retries=3),
        orch.Stage("boom", boom, deps=("flaky",), retries=1),
        orch.Stage("after_boom", passthrough, deps=("boom",)),
        orch.Stage("deep_skip", passthrough, deps=("after_boom",)),
        orch.Stage("after_flaky", passthrough, deps=("flaky",)),
    ]
    results, audit = orch.run_dag(spark, stages, "t")
    a = _audit_map(audit)
    assert a["flaky"] == ("success", 3, 1)  # 2 failures + 1 success
    assert a["boom"][0] == "failure" and a["boom"][1] == 2  # retries+1
    assert a["after_boom"][0] == "skipped"
    assert a["deep_skip"][0] == "skipped"  # transitive
    assert a["after_flaky"] == ("success", 1, 5)
    assert results["after_flaky"] == "ok"  # ctx passes upstream results
    assert "boom" not in results
    # the skip row names its offending upstream
    err = {r["stage"]: r["error"] for r in audit.collect()}
    assert "boom" in err["after_boom"] and "after_boom" in err["deep_skip"]


def test_topological_order_is_declaration_stable(spark):
    ran = []

    def mk(name):
        def fn(_ctx):
            ran.append(name)
            return None, None

        return fn

    stages = [
        orch.Stage("c", mk("c"), deps=("a", "b")),
        orch.Stage("a", mk("a")),
        orch.Stage("b", mk("b"), deps=("a",)),
    ]
    orch.run_dag(spark, stages, "t")
    assert ran == ["a", "b", "c"]


def test_malformed_dags_rejected(spark):
    ok = orch.Stage("a", lambda c: (None, None))
    with pytest.raises(orch.DagError, match="duplicate"):
        orch.run_dag(spark, [ok, orch.Stage("a", lambda c: (None, None))])
    with pytest.raises(orch.DagError, match="unknown"):
        orch.run_dag(
            spark, [orch.Stage("b", lambda c: (None, None), deps=("zz",))]
        )
    with pytest.raises(orch.DagError, match="cycle"):
        orch.run_dag(
            spark,
            [
                orch.Stage("x", lambda c: (None, None), deps=("y",)),
                orch.Stage("y", lambda c: (None, None), deps=("x",)),
            ],
        )


def test_weather_dag_all_green(spark):
    results, audit = orch.run_dag(spark, orch.weather_dag(spark), "w")
    a = _audit_map(audit)
    assert {s for s, (st, _, _) in a.items() if st == "success"} == set(a)
    assert a["quality_gate"][2] == 0  # zero violations
    # the two golds depend on the GATE: break it and they must skip
    stages = orch.weather_dag(spark)
    def bad_gate(_ctx):
        raise RuntimeError("gate down")
    stages = [
        orch.Stage("quality_gate", bad_gate, deps=("silver",))
        if s.name == "quality_gate"
        else s
        for s in stages
    ]
    _, audit2 = orch.run_dag(spark, stages, "w2")
    a2 = _audit_map(audit2)
    assert a2["quality_gate"][0] == "failure"
    assert a2["gold_daily"][0] == "skipped"
    assert a2["gold_hourly"][0] == "skipped"
    assert a2["silver"][0] == "success"


def test_retry_delay_goes_through_injected_sleeper(spark):
    """The reference waits retry_delay (5 min) between attempts; the
    sleeper is injectable so the semantics are assertable without
    wall-clock sleeping."""
    calls = []
    def always_fails(_ctx):
        raise RuntimeError("nope")
    stages = [orch.Stage("s", always_fails, retries=2,
                         retry_delay_sec=300.0)]
    _, audit = orch.run_dag(spark, stages, "p", sleeper=calls.append)
    assert calls == [300.0, 300.0]  # between attempts, not after last
    row = audit.collect()[0]
    assert row["status"] == "failure" and row["attempts"] == 3


def test_execution_timeout_cancels_spark_attempt_and_retries(spark):
    """A stage whose Spark job outlives its wall budget is cancelled
    at the job-group level (the attempt fails as retryable) — the
    reference's execution_timeout posture."""
    import time as _t

    from pyspark.sql import functions as F

    def slow(_ctx):
        # one task sleeping 30 s JVM-side: only cancellation can end
        # it early
        spark.range(1).select(
            F.expr("reflect('java.lang.Thread','sleep', 30000L)")
        ).collect()
        return None, 0

    t0 = _t.time()
    stages = [orch.Stage("slow", slow, retries=1,
                         execution_timeout_sec=2.0)]
    _, audit = orch.run_dag(spark, stages, "p")
    wall = _t.time() - t0
    row = audit.collect()[0]
    assert row["status"] == "failure"
    assert row["attempts"] == 2
    assert "ExecutionTimeout" in row["error"]
    assert wall < 25.0  # both attempts cancelled well under 2 x 30 s


def test_stage_without_timeout_unaffected(spark):
    stages = [orch.Stage("ok", lambda _ctx: ("x", 1),
                         execution_timeout_sec=5.0)]
    results, audit = orch.run_dag(spark, stages, "p")
    assert results["ok"] == "x"
    assert audit.collect()[0]["status"] == "success"


def test_on_failure_notifier_called_and_contained(spark):
    """Notify-then-continue: the notifier sees each failed stage's
    audit row; a RAISING notifier is itself audited and never aborts
    the run (the reference's notification task posture)."""
    seen = []
    def fail(_ctx):
        raise RuntimeError("boom")
    stages = [
        orch.Stage("bad", fail),
        orch.Stage("down", lambda _ctx: (None, 0), deps=("bad",)),
        orch.Stage("indep", lambda _ctx: (None, 0)),
    ]
    _, audit = orch.run_dag(spark, stages, "p", on_failure=seen.append)
    assert len(seen) == 1 and seen[0][1] == "bad"
    a = {r["stage"]: r["status"] for r in audit.collect()}
    assert a == {"bad": "failure", "down": "skipped", "indep": "success"}

    def bad_notifier(_row):
        raise ValueError("notifier down")
    _, audit2 = orch.run_dag(
        spark, stages, "p2", on_failure=bad_notifier
    )
    a2 = {r["stage"]: (r["status"], r["error"]) for r in audit2.collect()}
    assert a2["__notifier__"][0] == "failure"
    assert a2["indep"][0] == "success"  # run still completed


def test_cron_next_and_due_runs():
    """The reference's `0 * * * *` + catchup=False semantics, plus the
    grammar corners (steps, lists, ranges, dow-0=Sunday, leap day,
    the dom/dow OR-rule)."""
    from datetime import datetime

    n = orch.cron_next
    assert n("0 * * * *", datetime(2026, 8, 16, 10, 17)) == datetime(
        2026, 8, 16, 11, 0
    )
    assert n("*/15 * * * *", datetime(2026, 8, 16, 10, 16)) == datetime(
        2026, 8, 16, 10, 30
    )
    # 2026-08-16 is a Sunday: dow 0 fires the NEXT Sunday when the
    # time of day has passed
    assert n("30 2 * * 0", datetime(2026, 8, 16, 10, 0)) == datetime(
        2026, 8, 23, 2, 30
    )
    assert n("0 0 29 2 *", datetime(2026, 8, 16, 0, 0)) == datetime(
        2028, 2, 29, 0, 0
    )
    assert n("0 9-17 * * 1-5", datetime(2026, 8, 16, 12, 0)) == datetime(
        2026, 8, 17, 9, 0
    )  # weekend skipped to Monday 09:00
    # dom/dow OR-rule: both restricted → either matches (cron standard)
    assert n("0 0 1 * 0", datetime(2026, 8, 16, 10, 0)) == datetime(
        2026, 8, 23, 0, 0
    )  # next Sunday before Sep 1
    with pytest.raises(ValueError):
        n("99 * * * *", datetime(2026, 8, 16, 0, 0))

    due = orch.due_runs
    last, now = datetime(2026, 8, 16, 6, 0), datetime(2026, 8, 16, 10, 17)
    assert due("0 * * * *", last, now) == [datetime(2026, 8, 16, 10, 0)]
    assert due("0 * * * *", last, now, catchup=True) == [
        datetime(2026, 8, 16, h, 0) for h in (7, 8, 9, 10)
    ]
    assert due("0 * * * *", now, now) == []
