"""Oracle-parity harness — mirrors the driver's t2 check locally.

For every registered query with an oracle: run the Spark query and the
DuckDB SQL at sf0.01, compare row count, column names, per-column TYPE
CLASSES, and an order-insensitive value comparison (sorted rows,
NaN-safe).  Round 5 made this type-faithful (tools/typenorm.py): the
driver hashes typed values, so a DuckDB HUGEINT/DECIMAL result column
fails here even when its Python values equal Spark's — forcing the
repo's CAST(… AS BIGINT/DOUBLE) oracle convention (queries.py:12).
"""

from __future__ import annotations

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

from tools.typenorm import (
    duck_type_class,
    forbidden_columns,
    norm_rows,
    spark_type_class,
)

from conftest import SF_ORACLE


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    spark_cols = sorted(sdf.columns)
    spark_classes = [spark_type_class(f.dataType) for f in sdf.schema.fields]
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLE[name])
    duck_cols = sorted(rel.columns)
    duck_classes = [duck_type_class(t) for t in rel.types]
    duck_rows = rel.fetchall()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"

    # Hard contract: no HUGEINT/DECIMAL result columns in either engine —
    # the driver's pandas fetch turns them into float64 and the hash
    # diverges even on equal values (profile_events, CORRECTNESS_r04).
    bad_duck = forbidden_columns(rel.columns, duck_classes)
    assert not bad_duck, (
        f"{name}: oracle returns HUGEINT/DECIMAL columns {bad_duck} — "
        f"add CAST(... AS BIGINT/DOUBLE) per the convention at queries.py:12"
    )
    bad_spark = forbidden_columns(sdf.columns, spark_classes)
    assert not bad_spark, (
        f"{name}: Spark result has DecimalType columns {bad_spark} — "
        f"cast to bigint/double for a driver-hashable result"
    )

    # Per-column type classes must agree (sorted by column name, same
    # order the value hash uses).
    sp_by_col = dict(zip(sdf.columns, spark_classes))
    du_by_col = dict(zip(rel.columns, duck_classes))
    mism = {
        c: (sp_by_col[c], du_by_col[c])
        for c in spark_cols
        if sp_by_col[c] != du_by_col[c]
    }
    assert not mism, f"{name}: type-class mismatch spark!=duck: {mism}"

    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    a = norm_rows(spark_rows, sdf.columns, spark_classes)
    b = norm_rows(duck_rows, rel.columns, duck_classes)
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
