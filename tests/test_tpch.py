"""Invariant + plan tests for the TPC-H completion queries
(queries_tpch.py — Q4/Q5/Q6/Q8/Q9/Q11/Q16/Q20 analogs).

Oracle parity (tests/test_oracle_parity.py) proves value equality vs
DuckDB; these pin the invariants and physical-plan shapes parity cannot
see: pushdown, broadcast placement, single-scan decorrelation, top-k.
"""

from __future__ import annotations

import data_mastery_pipeline_spark.queries_tpch  # noqa: F401
from data_mastery_pipeline_spark.plans import inspect as plans
from data_mastery_pipeline_spark.registry import QUERIES

from conftest import SF_SMOKE


def test_q4_semi_join_no_fanout(spark, duck):
    """Each qualifying order contributes exactly once regardless of how
    many late lineitems it has (the EXISTS is a semi join, not inner).
    Asserted as EQUALITY against the count of DISTINCT qualifying
    orders (review r6, 9th pass: the old `<= all in-window orders`
    bound passed a semi→inner fan-out whenever qualifying orders were
    a small fraction of the window)."""
    rows = QUERIES["late_order_priorities"](spark, SF_SMOKE).collect()
    assert rows
    n_qualifying = duck.sql(
        f"SELECT count(DISTINCT o.o_orderkey) "
        f"FROM read_parquet('{SF_SMOKE}/orders.parquet') o "
        f"JOIN read_parquet('{SF_SMOKE}/lineitem.parquet') l "
        "  ON l.l_orderkey = o.o_orderkey "
        " AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY "
        "WHERE o.o_orderdate >= TIMESTAMP '1997-07-01' "
        "  AND o.o_orderdate < TIMESTAMP '1997-10-01'"
    ).fetchone()[0]
    assert sum(r["order_count"] for r in rows) == n_qualifying > 0


def test_q5_one_key_shuffle_rest_broadcast(spark):
    df = QUERIES["local_supplier_volume"](spark, SF_SMOKE)
    # customer, supplier (with the same-nation equi term), nation⋈region
    assert plans.broadcast_join_count(df) >= 3
    assert plans.cartesian_product_count(df) == 0
    rows = df.collect()
    # ASIA = 5 of 25 nations; revenue sorted descending
    assert 0 < len(rows) <= 5
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q6_filters_reach_the_scan(spark):
    df = QUERIES["forecast_revenue_change"](spark, SF_SMOKE)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    # projection pruned to the columns the aggregate needs
    cols = [c for group in plans.read_schema_columns(df) for c in group]
    assert "l_orderkey" not in cols and "l_returnflag" not in cols
    assert plans.exchange_count(df) <= 1  # single partial→final agg


def test_q8_share_is_a_probability_per_year(spark):
    rows = QUERIES["national_market_share"](spark, SF_SMOKE).collect()
    assert rows
    assert all(0.0 <= r["mkt_share"] <= 1.0 for r in rows)
    years = [r["o_year"] for r in rows]
    assert years == sorted(years)
    df = QUERIES["national_market_share"](spark, SF_SMOKE)
    assert plans.broadcast_join_count(df) >= 4  # part, cust, both nations, supp
    assert plans.cartesian_product_count(df) == 0


def test_q9_all_supplier_nations_appear(spark, duck):
    rows = QUERIES["product_profit_by_nation"](spark, SF_SMOKE).collect()
    # exactly the supplier nations that shipped a red part
    expected = {
        r[0]
        for r in duck.sql(
            f"""
            SELECT DISTINCT n_name
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            JOIN read_parquet('{SF_SMOKE}/part.parquet') p ON p_partkey = l_partkey
            JOIN read_parquet('{SF_SMOKE}/supplier.parquet') s ON s_suppkey = l_suppkey
            JOIN read_parquet('{SF_SMOKE}/nation.parquet') n ON n_nationkey = s_nationkey
            WHERE p_name LIKE '%red%'
            """
        ).fetchall()
    }
    assert {r["nation"] for r in rows} == expected
    # (nation, year desc) ordering
    keys = [(r["nation"], -r["o_year"]) for r in rows]
    assert keys == sorted(keys)


def test_q11_threshold_single_fact_scan(spark, duck):
    df = QUERIES["important_part_values"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    vals = [r["part_value"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    # every retained part really exceeds the 0.06% cutoff
    total = duck.sql(
        f"SELECT sum(l_extendedprice * (1 - l_discount)) "
        f"FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchone()[0]
    assert all(v > total * 0.0006 * 0.999 for v in vals)
    # the cutoff branch shares per_part's partkey exchange, so the
    # fact table is scanned ONCE at runtime: AQE replaces the second
    # agg subtree with a ReusedExchange (static ReuseExchange doesn't
    # unify the two shapes; the runtime one does — asserted on the
    # adaptive plan after execution). The old single-scan form was an
    # unpartitioned window over the part-grain relation — a
    # data-scale single-task stage, traded away in r8.
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final
    # and no single-task window anywhere
    assert plans.unpartitioned_window_count(df) == 0


def test_q16_denylist_suppliers_absent(spark, duck):
    rows = QUERIES["supplier_part_variety"](spark, SF_SMOKE).collect()
    assert rows
    n_ok_suppliers = duck.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/supplier.parquet') "
        "WHERE s_acctbal >= 0"
    ).fetchone()[0]
    assert all(0 < r["supplier_cnt"] <= n_ok_suppliers for r in rows)
    assert all(r["p_brand"] != "Brand#1" for r in rows)
    assert all(r["p_size"] in (1, 5, 9, 13, 17, 21, 25) for r in rows)


def test_q20_dominance_really_held(spark, duck):
    rows = QUERIES["dominant_part_suppliers"](spark, SF_SMOKE).collect()
    assert rows
    # distinct roster, deterministically ordered
    names = [(r["s_name"], r["n_name"]) for r in rows]
    assert names == sorted(names) and len(names) == len(set(names))
    # spot-check the dominance predicate end-to-end in the oracle engine
    n_dominant = duck.sql(
        f"""
        WITH sp AS (
          SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
          FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
          JOIN read_parquet('{SF_SMOKE}/part.parquet') p
            ON p.p_partkey = l.l_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY 1, 2
        ), pt AS (SELECT l_partkey, sum(qty) AS tq FROM sp GROUP BY 1)
        SELECT count(DISTINCT l_suppkey) FROM sp JOIN pt USING (l_partkey)
        WHERE qty > 0.5 * tq
        """
    ).fetchone()[0]
    assert len(rows) == n_dominant
