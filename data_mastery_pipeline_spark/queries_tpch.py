"""Decision-support completion: the eight TPC-H shapes not yet covered.

Rounds 2-5 covered Q1/Q2/Q3/Q7/Q10/Q12/Q13/Q14/Q15/Q17/Q18/Q19/Q21/Q22
forms across queries.py / queries_stats.py / queries_adv.py; this module
adds the remaining Q4/Q5/Q6/Q8/Q9/Q11/Q16/Q20 analogs so every TPC-H
join/agg/subquery shape has a named, oracle-checked query. The testdata
schema has no partsupp, commitdate or receiptdate, so:

- "late" (Q4/Q21 family) = shipped >= 60 days after the order date;
- supply cost (Q9) = 0.6 * p_retailprice (a fixed margin model);
- supply value / stock (Q11/Q20) = the quantities and prices observed
  in lineitem itself (the shippable-supply analog of ps_availqty).

All shapes keep the repo's plan discipline: dimension joins broadcast,
correlated subqueries decorrelated into aggregate joins, scalar
subqueries realized as broadcast single-row relations, top-k via
orderBy+limit (TakeOrderedAndProject). Oracle-parity conventions follow
registry.quantize: identical aliases both sides, doubles quantized with
the engine-agnostic floor form, explicit deterministic tie-breaks.

Reference parity: the reference engine's own test queries stop at
grouped aggregates and two-table joins (aggregation_pipeline.py,
silver_processor.py:279-304); this module is part of the beyond-parity
decision-support surface SURVEY §2.F/§2.A calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import quantize, query
from .tables import load_table


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi-join + grouped count)
# ---------------------------------------------------------------------------


@query(
    "late_order_priorities",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def late_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of quarter-1997 orders that had
    at least one lineitem shipped 60+ days after the order date.

    The EXISTS becomes a left-semi join whose condition references both
    sides (key equality + the lateness theta term) — Spark plans the
    equi part as the join key and evaluates the theta term as a join
    filter, so no fan-out and no post-join dedup.

    Scale: the quarter filter prunes the orders scan before the join;
    the semi join shuffles each side once on orderkey and emits at most
    one row per order; the 5-group agg is map-side partial.
    """
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (6-way join, same-nation theta condition)
# ---------------------------------------------------------------------------


@query(
    "local_supplier_volume",
    """
    SELECT n.n_name,
           floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100.0
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 1997 revenue by nation where the customer and the
    supplier sit in the same ASIA nation.

    Scale: the only data-sized shuffle is lineitem⋈orders on orderkey;
    customer, supplier, nation, region are all broadcast, and the
    same-nation condition (c_nationkey = s_nationkey) rides the
    supplier broadcast join as an equi term instead of a post-filter.
    The region filter prunes nations before anything touches the fact
    tables.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(asia_nations), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            quantize(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                "revenue",
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (pure scan-aggregate, everything pushed down)
# ---------------------------------------------------------------------------


@query(
    "forecast_revenue_change",
    """
    SELECT floor(sum(l_extendedprice * l_discount) * 100 + 0.5) / 100.0
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue given up to mid-band discounts on small
    1997 shipments — a single scan-aggregate with every predicate
    eligible for parquet pushdown (ship-date range, discount band,
    quantity cap) and a two-column read schema.

    Scale: zero joins, one partial+final agg; at 100 TB this is
    min/max-stats row-group skipping on l_shipdate plus a projection
    down to (l_extendedprice, l_discount). The discount band compares
    against the same double literals both engines parse identically.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(quantize(F.sum(F.col("l_extendedprice") * F.col("l_discount")), "revenue"))


# ---------------------------------------------------------------------------
# Q8 — national market share (8-way join, conditional share per year)
# ---------------------------------------------------------------------------


@query(
    "national_market_share",
    """
    SELECT o_year,
           floor(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END)
                 / sum(volume) * 1000000 + 0.5) / 1000000.0 AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7 suppliers' share of ECONOMY-part revenue
    sold into AMERICA customers, by order year — the full 8-relation
    star with nation role-played twice (customer side filters the
    market, supplier side labels the competitor).

    Scale: lineitem⋈orders is the one key shuffle; part (filtered to
    one type), customer, both nation roles, region, and supplier all
    broadcast. The share is a conditional-sum / sum pair computed in
    one agg pass — no second scan for the denominator.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cust_nationkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("supp_nationkey"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cust_nationkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("supp_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("nation"),
        )
    )
    share = F.sum(
        F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(0.0)
    ) / F.sum("volume")
    return (
        joined.groupBy("o_year")
        .agg(quantize(share, "mkt_share", decimals=6))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit (expression profit, two-key rollup)
# ---------------------------------------------------------------------------


@query(
    "product_profit_by_nation",
    """
    SELECT nation, o_year,
           floor(sum(amount) * 100 + 0.5) / 100.0 AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on red parts by supplier nation and order
    year, with supply cost modeled as a fixed 60% retail margin (no
    partsupp in this schema).

    Scale: the part-name LIKE filter broadcasts a ~13% part subset that
    prunes lineitem via the broadcast hash join before the
    lineitem⋈orders key shuffle; supplier and nation broadcast; the
    (nation, year) agg is 25×7 groups — map-side partials collapse
    almost everything.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").contains("red"))
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(quantize(F.sum("amount"), "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 — important stock (group-by + HAVING against a scalar subquery)
# ---------------------------------------------------------------------------


@query(
    "important_part_values",
    """
    WITH per_part AS (
      SELECT l_partkey,
             sum(l_extendedprice * (1 - l_discount)) AS part_value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey,
           floor(part_value * 100 + 0.5) / 100.0 AS part_value
    FROM per_part
    WHERE part_value > (SELECT sum(part_value) * 0.0006 FROM per_part)
    ORDER BY part_value DESC, l_partkey
    """,
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose observed supply value (discounted
    lineitem revenue — the ps_supplycost*ps_availqty analog) exceeds a
    fixed fraction of the total, i.e. a grouped aggregate HAVING-
    compared against a scalar subquery over the same aggregate.

    Scale: ONE shuffle agg on partkey produces per_part; the scalar
    total is a broadcast 1-row agg over the SAME per_part subtree, so
    the partkey exchange is reused (ReusedExchange — the fact table is
    scanned once) and the part-grain relation never funnels through a
    single-task window stage (r8: the old global-window form shuffled
    the n_parts relation — which GROWS with data — to one task). The
    final sort runs on the filtered handful of rows.
    """
    li = load_table(spark, "lineitem", sf_dir)
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "part_value_raw"
        )
    )
    tot = per_part.agg(
        (F.sum("part_value_raw") * 0.0006).alias("cutoff")
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value_raw") > F.col("cutoff"))
        .select("l_partkey", quantize(F.col("part_value_raw"), "part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier variety (distinct-count + NOT-IN exclusion)
# ---------------------------------------------------------------------------


@query(
    "supplier_part_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) bucket, excluding a NOT-IN supplier denylist
    (negative account balance standing in for the comment-flagged
    complaint suppliers).

    Scale: the denylist is a ~6-row relation applied as a broadcast
    left-anti join (the decorrelated NOT IN — safe here because
    s_suppkey is non-null by schema); part filters broadcast; the
    distinct-count shuffles once on the (brand, type, size) group key
    with partial distinct aggregation upstream.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25)
    )
    bad = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — excess stock suppliers (nested agg comparison → semi-join chain)
# ---------------------------------------------------------------------------


@query(
    "dominant_part_suppliers",
    """
    WITH small_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ), supp_part AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
      FROM lineitem
      JOIN small_parts ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
    ), part_total AS (
      SELECT l_partkey, sum(qty) AS total_qty FROM supp_part GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM supp_part sp
    JOIN part_total pt ON pt.l_partkey = sp.l_partkey
    JOIN supplier s ON s.s_suppkey = sp.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE sp.qty > 0.5 * pt.total_qty
    ORDER BY s.s_name, n.n_name
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than half of some
    small-part's total 1997 volume — the nested ps_availqty > 0.5 *
    sum(shipped) comparison rebuilt on observed shipments, ending in a
    distinct supplier roster.

    Scale: one shuffle agg on (supp, part) over the name+year-pruned
    lineitem subset; the per-part total re-aggregates that small
    relation (no second fact scan) and joins back broadcast; supplier
    and nation hydrate broadcast; DISTINCT runs on ≤ n_suppliers rows.
    """
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    small = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    supp_part = (
        li.join(F.broadcast(small), li.l_partkey == small.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = supp_part.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty")
    )
    return (
        supp_part.join(F.broadcast(part_total), "l_partkey")
        .filter(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name", "n_name")
    )
