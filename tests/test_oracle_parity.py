"""Oracle-parity harness — mirrors the driver's t2 check locally.

For every registered query with an oracle: run the Spark query and the
DuckDB SQL at sf0.01, compare row count, column names, and an
order-insensitive value comparison (sorted rows, NaN-safe).
"""

from __future__ import annotations

import math

import pytest

import data_mastery_pipeline_spark.queries  # noqa: F401
import data_mastery_pipeline_spark.queries_adv  # noqa: F401
import data_mastery_pipeline_spark.queries_ext  # noqa: F401
import data_mastery_pipeline_spark.queries_src  # noqa: F401
import data_mastery_pipeline_spark.queries_stats  # noqa: F401
import data_mastery_pipeline_spark.queries_stream  # noqa: F401
import data_mastery_pipeline_spark.queries_ops  # noqa: F401
import data_mastery_pipeline_spark.queries_tpch  # noqa: F401
from data_mastery_pipeline_spark.registry import ORACLE, QUERIES

from conftest import SF_ORACLE


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", round(v, 6))
    if isinstance(v, bool):
        return ("b", v)
    return (type(v).__name__[0], str(v))


def _norm_rows(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLE[name])
    duck_cols = sorted(rel.columns)
    duck_rows = rel.fetchall()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    a = _norm_rows(spark_rows, sdf.columns)
    b = _norm_rows(duck_rows, rel.columns)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(f"{name}: value mismatch\n spark-only={diff_a}\n duck-only={diff_b}")


def test_every_query_runs(spark):
    """Queries without an oracle must still execute and return a schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        df.limit(5).collect()
