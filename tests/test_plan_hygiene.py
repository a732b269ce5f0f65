"""Global plan-hygiene sweep (round 6): EVERY registered pure-plan query
must satisfy the 100 TB invariants —

1. zero CartesianProduct nodes (the O(n·m) disaster switch);
2. zero row-at-a-time Python UDFs (`BatchEvalPython`) in the plan — the
   only sanctioned Python path is Arrow-batched (`ArrowEvalPython` /
   mapInPandas), and the §2 core uses none at all;
3. the plan builds (no analysis errors) against sf0.001.

Per-query plan-shape tests (test_plans.py) pin the interesting plans
precisely; this sweep is the tripwire that keeps a FUTURE query from
shipping a cartesian or a row-Python hot path unnoticed — the same role
test_oracle_types.py plays for oracle types.

Action-queries (modules whose construction executes work: source/sink
round trips, streaming drains) are excluded — their cost is the action,
and their plans are sink-table scans; the plan sweep would time out
re-running their physical work for no signal.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E  # noqa: F401  (registers every query module)
from data_mastery_pipeline_spark import plans
from data_mastery_pipeline_spark.registry import QUERIES

from conftest import SF_SMOKE

# pure-plan modules: construction only declares a DataFrame
_PURE_MODULES = (
    "data_mastery_pipeline_spark.queries",
    "data_mastery_pipeline_spark.queries_adv",
    "data_mastery_pipeline_spark.queries_ext",
    "data_mastery_pipeline_spark.queries_ops",
    "data_mastery_pipeline_spark.queries_stats",
    "data_mastery_pipeline_spark.queries_tpch",
)

_PURE = sorted(
    name for name, fn in QUERIES.items() if fn.__module__ in _PURE_MODULES
)

# deliberate, size-bounded exceptions to the no-cartesian rule — each
# must carry a justification here, not just in its docstring
_CARTESIAN_OK: dict[str, str] = {}


def test_sweep_covers_most_of_the_registry():
    assert len(_PURE) >= 120, f"sweep shrank to {len(_PURE)} queries"


@pytest.mark.parametrize("name", _PURE)
def test_plan_hygiene(name, spark):
    df = QUERIES[name](spark, SF_SMOKE)
    plan = plans.inspect.formatted_plan(df)
    if name not in _CARTESIAN_OK:
        n_cart = plans.inspect.cartesian_product_count(df)
        assert n_cart == 0, f"{name}: {n_cart} cartesian product(s)"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
