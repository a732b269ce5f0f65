"""Bucketed-table co-location: an equi join of two tables bucketed on
the join key must plan with ZERO shuffle exchanges, and a groupBy on the
bucket key must not re-shuffle. The 100 TB fact⋈fact strategy, proved
on the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark import plans
from data_mastery_pipeline_spark.sources import bucketing
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, "lineitem", SF_ORACLE).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, "orders", SF_ORACLE).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    bucketing.write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8,
                             sort_cols=["l_orderkey"])
    bucketing.write_bucketed(orders, "b_orders", ["l_orderkey"], n_buckets=8,
                             sort_cols=["l_orderkey"])
    yield "b_lineitem", "b_orders"
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketing.colocated_join(spark, lt, rt, on=["l_orderkey"])
    assert plans.exchange_count(joined) == 0, plans.formatted_plan(joined)


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketing.colocated_join(spark, lt, rt, on=["l_orderkey"])
    li = load_table(spark, "lineitem", SF_ORACLE)
    orders = load_table(spark, "orders", SF_ORACLE)
    expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == expected


def test_groupby_on_bucket_key_has_no_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert plans.exchange_count(agg) == 0, plans.formatted_plan(agg)
