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

from tools.typenorm import compare_results, duck_type_class, spark_type_class

from conftest import SF_ORACLE


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    spark_classes = [spark_type_class(f.dataType) for f in sdf.schema.fields]
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLE[name])
    duck_classes = [duck_type_class(t) for t in rel.types]
    duck_rows = rel.fetchall()

    res = compare_results(
        sdf.columns, spark_classes, spark_rows,
        rel.columns, duck_classes, duck_rows,
    )
    assert res["cols_match"], (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(rel.columns)}"
    )
    # Hard contract: no HUGEINT/DECIMAL result columns in either engine —
    # the driver's pandas fetch turns them into float64 and the hash
    # diverges even on equal values (profile_events, CORRECTNESS_r04).
    assert not res["forbidden"], (
        f"{name}: HUGEINT/DECIMAL result columns {res['forbidden']} — "
        f"add CAST(... AS BIGINT/DOUBLE) per the convention at queries.py:12"
    )
    assert not res["class_mismatch"], (
        f"{name}: type-class mismatch spark!=duck: {res['class_mismatch']}"
    )
    assert res["rows_match"], (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    assert res["values_match"], (
        f"{name}: value mismatch\n spark-only={res['spark_only']}\n "
        f"duck-only={res['duck_only']}"
    )


def test_every_query_runs(spark):
    """Queries without an oracle must still execute and return a schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        df.limit(5).collect()
