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


def test_bucketed_cdc_full_outer_diff_has_no_shuffle(spark):
    """The snapshot_diff (CDC) plan on bucketed snapshots: a full-outer
    join of two tables bucketed on the key must read buckets pairwise —
    zero Exchange before the join — which is what makes keyed diffing
    viable at 100 TB (the diff agg's own tiny shuffle remains)."""
    o = load_table(spark, "orders", SF_ORACLE).select("o_orderkey", "o_totalprice")
    old = o.filter(F.col("o_orderkey") % 101 != 0)
    new = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") * 1.1).otherwise(
            F.col("o_totalprice")
        ),
    )
    try:
        bucketing.write_bucketed(
            old.withColumnRenamed("o_totalprice", "old_price"),
            "b_snap_old", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
        )
        bucketing.write_bucketed(
            new.withColumnRenamed("o_totalprice", "new_price"),
            "b_snap_new", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
        )
        joined = bucketing.colocated_join(
            spark, "b_snap_old", "b_snap_new", ["o_orderkey"], how="full_outer"
        )
        # no Exchange feeds the join: only bucket-pairwise reads
        diff = joined.select(
            F.when(F.col("old_price").isNull(), "insert")
            .when(F.col("new_price").isNull(), "delete")
            .when(F.col("new_price") != F.col("old_price"), "update")
            .otherwise("unchanged")
            .alias("change_type")
        )
        assert plans.exchange_count(diff) == 0
        counts = {
            r["change_type"]: r["n"]
            for r in diff.groupBy("change_type").agg(F.count("*").alias("n")).collect()
        }
        n_old = old.count()
        n_new = new.count()
        assert counts.get("insert", 0) == n_new - n_old  # mod-101 keys only in new
        assert counts.get("delete", 0) == 0  # old ⊆ new here
        assert counts.get("update", 0) > 0
        assert sum(counts.values()) == n_new
    finally:
        for t in ("b_snap_old", "b_snap_new"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
