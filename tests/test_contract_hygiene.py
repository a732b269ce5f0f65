"""Driver-contract hygiene — pure-Python guards (no Spark session)
against the silent failure modes of the grading loop:

- a typo in ``__spark_entry__._PRIORITY`` would quietly burn a
  verification slot on a nonexistent name (the ordering IS the
  round's verification budget);
- a registered query without an oracle would downgrade to the weaker
  rows-only check without anyone deciding that;
- a queries()/oracle_sql() keyset drift would surface as driver-side
  KeyErrors instead of a reviewable diff here.
"""

from __future__ import annotations

import __spark_entry__ as E
from data_mastery_pipeline_spark.registry import ORACLE, QUERIES


def test_priority_names_are_real_and_unique():
    assert len(set(E._PRIORITY)) == len(E._PRIORITY), "duplicate priority"
    missing = [p for p in E._PRIORITY if p not in QUERIES]
    assert not missing, f"_PRIORITY names not registered: {missing}"


def test_every_query_has_an_oracle():
    # the repo's standing bar: 100% oracle coverage (genuinely
    # non-SQL-expressible ops would be a deliberate, reviewed exception)
    missing = sorted(set(QUERIES) - set(ORACLE))
    assert not missing, f"queries without oracles: {missing}"


def test_oracle_sql_and_queries_keysets_match():
    assert set(E.queries().keys()) == set(QUERIES)
    assert set(E.oracle_sql().keys()) <= set(QUERIES)


def test_bench_headline_names_are_registered():
    import bench

    unknown = [q for q in bench.HEADLINE if q not in QUERIES]
    assert not unknown, f"bench.HEADLINE names not registered: {unknown}"
