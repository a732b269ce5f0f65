"""Schema-only typenorm sweep over EVERY registered oracle (VERDICT r05
task 5): binding each oracle SQL in DuckDB exposes its result types
without executing it, so this test is cheap enough to cover all
registered queries on every pytest run — a future uncast ``sum(CASE …)``
(HUGEINT) or ``avg(DECIMAL)`` can never reach the driver again.

The full value-level parity check lives in test_oracle_parity.py; this
sweep is the fast tripwire for the type-class convention
(queries.py:12 — every oracle aggregate is CAST to BIGINT/DOUBLE).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E  # noqa: F401  (registers all query modules)
from data_mastery_pipeline_spark.registry import ORACLE, QUERIES
from tools.typenorm import duck_type_class


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_schema_has_no_forbidden_types(name, duck):
    rel = duck.sql(ORACLE[name])  # binds + plans; does NOT execute
    bad = {
        col: str(t)
        for col, t in zip(rel.columns, rel.types)
        if duck_type_class(t) in ("hug", "dec")
    }
    assert not bad, (
        f"oracle '{name}' produces driver-hash-unsafe column types {bad}: "
        "CAST the aggregate to BIGINT/DOUBLE on BOTH sides"
    )


def test_registry_is_fully_oracle_backed():
    """Every registered query carries an oracle (the repo's standing
    claim — VERDICT r05 verified 179/179); a new rows-only query must
    be a deliberate, documented exception."""
    missing = sorted(set(QUERIES) - set(ORACLE))
    assert not missing, f"queries registered without oracles: {missing}"
