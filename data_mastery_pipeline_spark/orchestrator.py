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

from .localrel import local_frame

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
    # wall budget per ATTEMPT (the reference's execution_timeout at
    # weather_pipeline_dag.py:20-30). Enforced for real: the attempt
    # runs under a Spark job group and a blown budget cancels the
    # group — in-flight Spark jobs abort and the attempt fails as
    # retryable, Airflow's timeout-then-retry posture. (Pure-Python
    # stage bodies that never touch Spark can't be preempted —
    # documented Python limit; their overrun is still detected and
    # audited the moment they return.)
    execution_timeout_sec: float | None = None


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


class ExecutionTimeout(RuntimeError):
    """A stage attempt exceeded its ``execution_timeout_sec``."""


def _attempt(spark, s: Stage, results: dict, group: str):
    """One attempt of a stage body, under its wall budget. Runs the
    body in a worker thread tagged with a Spark job group; a blown
    budget cancels the group (aborting in-flight Spark jobs) and
    raises ExecutionTimeout."""
    if not s.execution_timeout_sec:
        return s.fn(results)
    import threading

    box: dict = {}

    def _run():
        spark.sparkContext.setJobGroup(group, s.name, True)
        try:
            box["out"] = s.fn(results)
        except BaseException as ex:  # noqa: BLE001 — re-raised below
            box["err"] = ex
        finally:
            # Spark 4 removed SparkContext.clearJobGroup (SPARK-44321);
            # the group is thread-local and this worker thread exits
            # right after, so clearing the property directly suffices.
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    t.join(s.execution_timeout_sec)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        t.join(5.0)  # grace for the cancellation to surface
        raise ExecutionTimeout(
            f"stage {s.name!r} exceeded {s.execution_timeout_sec}s"
        )
    if "err" in box:
        raise box["err"]
    return box["out"]


def run_dag(
    spark: SparkSession,
    stages: Sequence[Stage],
    pipeline_name: str = "dag",
    on_failure: Callable[[tuple], None] | None = None,
    sleeper: Callable[[float], None] = time.sleep,
) -> tuple[dict, DataFrame]:
    """Execute the DAG; returns (results map, audit DataFrame).

    Semantics (each pinned by test):
    - stages run in a deterministic topological order;
    - a failing stage is retried up to ``retries`` times (audit records
      the attempt count), then marked ``failure``; ``retry_delay_sec``
      waits between attempts through ``sleeper`` (injectable — tests
      assert the delays without sleeping; the reference waits 5 min);
    - an attempt that blows ``execution_timeout_sec`` is cancelled at
      the Spark job level and counts as a retryable failure;
    - every stage downstream of a non-success — transitively — is
      ``skipped`` with the offending upstream named in its audit row;
    - ``on_failure`` (the reference's notification task,
      weather_pipeline_dag.py:226-249) is invoked once per FAILED
      stage with its audit row — notify-then-continue, never abort; a
      raising notifier is itself contained and audited against the
      pipeline;
    - the run never raises for a stage failure: the audit IS the
      outcome (the caller decides severity)."""
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
                result, rows = _attempt(
                    spark, s, results,
                    f"{pipeline_name}:{s.name}:a{attempts}",
                )
            except Exception as ex:  # noqa: BLE001 — audit, don't abort
                err = f"{type(ex).__name__}: {ex}"
                if attempts <= s.retries and s.retry_delay_sec > 0:
                    sleeper(s.retry_delay_sec)
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
            row = (pipeline_name, s.name, "failure", attempts, None, err)
            rows_out.append(row)
            if on_failure is not None:
                try:
                    on_failure(row)
                except Exception as nex:  # noqa: BLE001 — notifier
                    # failures must not fail the pipeline (the
                    # reference's notify-then-continue posture)
                    rows_out.append(
                        (
                            pipeline_name,
                            "__notifier__",
                            "failure",
                            1,
                            None,
                            f"{type(nex).__name__}: {nex}",
                        )
                    )
    return results, local_frame(spark, rows_out, AUDIT_SCHEMA)


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
        from .checkpointing import truncate_lineage

        # checkpoint the bronze frame HERE: the REST source is a Python
        # datasource, so every downstream action would otherwise re-pay
        # the whole Python read (the audit count + the silver checkpoint
        # job each did — guide §4: cross the Python boundary once).
        # Blocks are released by the caller with the silver frame.
        bronze = truncate_lineage(pipeline.ingest_bronze(spark, n_cycles=n_cycles))
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


# ---------------------------------------------- schedule semantics

# the reference's schedule (weather_pipeline_dag.py: `0 * * * *`,
# catchup=False) — kept here as data so deployments can hand it to
# cron_next/due_runs
WEATHER_SCHEDULE = "0 * * * *"


def _parse_field(f: str, lo: int, hi: int) -> set[int]:
    vals: set[int] = set()
    for part in f.split(","):
        step = 1
        rng = part
        if "/" in part:
            rng, step_s = part.split("/")
            step = int(step_s)
        if rng == "*":
            a, b = lo, hi
        elif "-" in rng:
            a_s, b_s = rng.split("-")
            a, b = int(a_s), int(b_s)
        else:
            a = b = int(rng)
        if not (lo <= a <= b <= hi):
            raise ValueError(f"cron field out of range: {part!r}")
        vals.update(range(a, b + 1, step))
    return vals


def cron_next(expr: str, after):
    """Next fire time STRICTLY after ``after`` for a 5-field cron
    expression (minute hour day-of-month month day-of-week; *, */n,
    lists, ranges; dow 0=Sunday with 7≡0; standard cron OR-rule when
    both day fields are restricted). The wall-clock SEMANTICS of the
    reference's schedule, engine-computable — the waiting itself stays
    with the deployment's scheduler (module docstring)."""
    from datetime import timedelta

    m, h, dom, mon, dow = expr.split()
    mins = _parse_field(m, 0, 59)
    hrs = _parse_field(h, 0, 23)
    doms = _parse_field(dom, 1, 31)
    mons = _parse_field(mon, 1, 12)
    dows = {d % 7 for d in _parse_field(dow, 0, 7)}
    dom_star, dow_star = dom == "*", dow == "*"
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    # bound: any satisfiable schedule fires within 4 years (leap-day
    # schedules are the extreme); day-level skipping keeps this cheap
    end = t + timedelta(days=4 * 366)
    while t < end:
        dow_ok = t.isoweekday() % 7 in dows
        dom_ok = t.day in doms
        day_ok = t.month in mons and (
            dom_ok
            if dow_star
            else dow_ok
            if dom_star
            else (dom_ok or dow_ok)
        )
        if not day_ok:
            t = (t + timedelta(days=1)).replace(hour=0, minute=0)
            continue
        if t.hour not in hrs:
            t = (t + timedelta(hours=1)).replace(minute=0)
            continue
        if t.minute in mins:
            return t
        t += timedelta(minutes=1)
    raise ValueError(f"unsatisfiable cron expression: {expr!r}")


def due_runs(expr: str, last_run, now, catchup: bool = False):
    """Fire times in (last_run, now]: the reference's catchup=False
    yields only the LATEST missed slot (one run covers the gap);
    catchup=True yields every missed slot in order. Empty if nothing
    is due. With ``max_active_runs=1`` semantics the caller executes
    these sequentially — which run_dag's synchronous loop gives for
    free."""
    out = []
    t = last_run
    while True:
        t = cron_next(expr, t)
        if t > now:
            break
        out.append(t)
    if not catchup and out:
        return [out[-1]]
    return out
