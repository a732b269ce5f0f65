"""local_frame must be value- and schema-equivalent to createDataFrame
(the sites it replaced were previously Python-parallelized relations),
and must plan as a JVM LocalRelation — no Python RDD evaluation."""

import datetime
import math

import pytest

from data_mastery_pipeline_spark.localrel import local_frame


@pytest.fixture(scope="module")
def spark():
    from data_mastery_pipeline_spark.session import get_spark

    return get_spark(app_name="test_localrel")


def test_matches_createdataframe_values_and_schema(spark):
    rows = [
        (1, "a'b\\c", 1.5, True, None),
        (None, None, float("nan"), False, 7),
        (2, "line\nbreak", float("-inf"), None, -3),
    ]
    ddl = "id long, s string, x double, b boolean, k int"
    a = local_frame(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert a.schema == b.schema
    ra = [tuple(r) for r in a.collect()]
    rb = [tuple(r) for r in b.collect()]
    # NaN != NaN; compare with repr
    assert [tuple(map(repr, t)) for t in ra] == [
        tuple(map(repr, t)) for t in rb
    ]


def test_temporal_and_binary_literals(spark):
    rows = [
        (
            datetime.datetime(2024, 2, 1, 12, 30, 15, 123456),
            datetime.date(2024, 2, 2),
            b"\x00\xff",
        )
    ]
    ddl = "ts timestamp, d date, raw binary"
    a = local_frame(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert a.schema == b.schema
    assert a.collect() == b.collect()


def test_empty_frame_keeps_schema(spark):
    ddl = "event_type string, n bigint, sum_cents bigint"
    a = local_frame(spark, [], ddl)
    b = spark.createDataFrame([], ddl)
    assert a.schema == b.schema
    assert a.count() == 0


def test_double_roundtrip_exact(spark):
    vals = [0.1, 1e-300, 1.7976931348623157e308, -2.5, 3.141592653589793]
    rows = [(v,) for v in vals]
    got = [r.x for r in local_frame(spark, rows, "x double").collect()]
    assert all(
        math.isclose(g, v, rel_tol=0, abs_tol=0) for g, v in zip(got, vals)
    )


def test_plans_as_local_relation_no_python(spark):
    df = local_frame(spark, [(1, "a")], "i int, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Scan ExistingRDD" not in plan


def test_arity_mismatch_raises(spark):
    with pytest.raises(ValueError):
        local_frame(spark, [(1,)], "i int, s string")
