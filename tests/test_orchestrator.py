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
