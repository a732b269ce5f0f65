"""Stage-DAG orchestration — the reference's Airflow operational
semantics re-expressed engine-side (weather_pipeline_dag.py: the task
graph at :316-317, ``retries=3``/``retry_delay`` at :14-22,
``max_active_runs=1`` sequencing, failure short-circuiting).

What the ENGINE owes its users from that surface is deterministic
dependency-ordered execution, per-stage retry, downstream SKIP on
upstream failure, and an auditable run record — this module. What
stays with a deployment's scheduler is wall-clock triggering, email,
and sensors (Airflow-specific operational plumbing, not dataflow).

Orchestration is driver-side control flow BY NATURE: each stage's body
is a Spark job (the data never routes through this module), so the
runner adds zero data movement at any scale — the 100 TB cost lives in
the stages, which are the library operators the contract queries
already oracle-check. Contrast with the reference, which ships stage
state across process boundaries through Kafka/S3/XCom; here a stage
hands its downstream a DataFrame (lazy plan) through the results map.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

AUDIT_SCHEMA = (
    "pipeline string, stage string, status string, attempts int, "
    "rows_processed bigint, error string"
)


@dataclass(frozen=True)
class Stage:
    """One DAG node. ``fn(results) -> (result, rows)`` receives the map
    of upstream results (keyed by stage name) — the XCom analog, minus
    the serialization boundary. ``retries`` mirrors the reference's
    default_args (attempt count = retries + 1)."""

    name: str
    fn: Callable[[dict], tuple[object, int | None]]
    deps: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_sec: float = 0.0


class DagError(ValueError):
    """Malformed DAG: duplicate names, unknown deps, or a cycle."""


def _topo_order(stages: Sequence[Stage]) -> list[Stage]:
    """Kahn's algorithm, stable on declaration order (deterministic
    runs — the max_active_runs=1 sequencing analog)."""
    by_name = {}
    for s in stages:
        if s.name in by_name:
            raise DagError(f"duplicate stage name {s.name!r}")
        by_name[s.name] = s
    for s in stages:
        unknown = [d for d in s.deps if d not in by_name]
        if unknown:
            raise DagError(f"stage {s.name!r} depends on unknown {unknown}")
    pending = {s.name: set(s.deps) for s in stages}
    order: list[Stage] = []
    while pending:
        ready = [s for s in stages if s.name in pending and not pending[s.name]]
        if not ready:
            raise DagError(f"dependency cycle among {sorted(pending)}")
        for s in ready:
            order.append(s)
            del pending[s.name]
            for deps in pending.values():
                deps.discard(s.name)
    return order


def run_dag(
    spark: SparkSession,
    stages: Sequence[Stage],
    pipeline_name: str = "dag",
) -> tuple[dict, DataFrame]:
    """Execute the DAG; returns (results map, audit DataFrame).

    Semantics (each pinned by test):
    - stages run in a deterministic topological order;
    - a failing stage is retried up to ``retries`` times (audit records
      the attempt count), then marked ``failure``;
    - every stage downstream of a non-success — transitively — is
      ``skipped`` with the offending upstream named in its audit row;
    - the run never raises for a stage failure: the audit IS the
      outcome (the caller decides severity), matching the reference's
      email-then-continue posture rather than a hard abort."""
    order = _topo_order(stages)
    state: dict[str, str] = {}
    results: dict[str, object] = {}
    rows_out: list[tuple] = []
    for s in order:
        bad = [d for d in s.deps if state.get(d) != "success"]
        if bad:
            state[s.name] = "skipped"
            rows_out.append(
                (
                    pipeline_name,
                    s.name,
                    "skipped",
                    0,
                    None,
                    f"upstream {bad[0]!r} {state[bad[0]]}",
                )
            )
            continue
        attempts, err = 0, None
        while attempts <= s.retries:
            attempts += 1
            try:
                result, rows = s.fn(results)
            except Exception as ex:  # noqa: BLE001 — audit, don't abort
                err = f"{type(ex).__name__}: {ex}"
                if attempts <= s.retries and s.retry_delay_sec > 0:
                    time.sleep(s.retry_delay_sec)
                continue
            results[s.name] = result
            state[s.name] = "success"
            rows_out.append(
                (
                    pipeline_name,
                    s.name,
                    "success",
                    attempts,
                    None if rows is None else int(rows),
                    None,
                )
            )
            break
        else:
            state[s.name] = "failure"
            rows_out.append(
                (pipeline_name, s.name, "failure", attempts, None, err)
            )
    return results, spark.createDataFrame(rows_out, AUDIT_SCHEMA)


# ------------------------------------------------- the reference's DAG


def weather_dag(
    spark: SparkSession, n_cycles: int = 24, retries: int = 3
) -> list[Stage]:
    """The reference's weather_pipeline task graph on this engine's
    stages (weather_pipeline_dag.py:316-317): source availability check
    → bronze ingest → silver clean/derive → quality gate → the two gold
    aggregates. One DELIBERATE deviation from the reference: its DAG
    orders load_gold BEFORE quality_check (check_api >> ingest >>
    consume >> silver >> load_gold >> quality_check — validate after
    loading), while here the golds depend on the GATE, so bad data
    never reaches the serving tables. This is gate-before-load by
    choice, not reference parity.

    Checkpoint ownership: the silver stage localCheckpoints its frame
    (4 downstream consumers). The checkpoint blocks outlive run_dag —
    a caller that re-runs the DAG in a long-lived driver must
    ``checkpointing.release(results["silver"])`` once both golds are
    consumed, or the blocks accumulate per run (queries_src.py's
    weather_dag_run does exactly this)."""
    from . import pipeline
    from .operators import quality
    from .sources import rest

    def check_source(_ctx):
        # check_api_availability analog on the pure synthetic fetcher:
        # every configured city must parse (driver-side, no Spark job)
        ok = [
            c
            for c in rest.DEFAULT_CITIES
            if rest.parse_weather(rest.synthetic_fetch(c)) is not None
        ]
        if len(ok) != len(rest.DEFAULT_CITIES):
            raise RuntimeError("weather source unavailable for some cities")
        return None, len(ok)

    def ingest(_ctx):
        bronze = pipeline.ingest_bronze(spark, n_cycles=n_cycles)
        return bronze, bronze.count()

    def silver(ctx):
        df = pipeline.to_silver(ctx["ingest_bronze"])
        from .checkpointing import truncate_lineage

        df = truncate_lineage(df)  # 4 downstream consumers
        return df, df.count()

    def gate(ctx):
        rep = quality.check_quality(
            ctx["silver"],
            key_cols=["city", "timestamp"],
            null_checked=["city", "timestamp", "temperature"],
            range_checks=[("temperature", *pipeline.TEMP_BOUNDS)],
        )
        if not rep.passed:
            raise RuntimeError(f"quality gate failed: {rep.failures}")
        return rep, 0  # rows_processed = violations

    def gold_daily(ctx):
        df = pipeline.silver_daily(ctx["silver"])
        return df, df.count()

    def gold_hourly(ctx):
        df = pipeline.silver_hourly(ctx["silver"])
        return df, df.count()

    return [
        Stage("check_source", check_source, retries=retries),
        Stage("ingest_bronze", ingest, deps=("check_source",)),
        Stage("silver", silver, deps=("ingest_bronze",)),
        Stage("quality_gate", gate, deps=("silver",)),
        Stage("gold_daily", gold_daily, deps=("quality_gate", "silver")),
        Stage("gold_hourly", gold_hourly, deps=("quality_gate", "silver")),
    ]
