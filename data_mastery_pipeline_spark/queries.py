"""Named query registry — the driver contract surface.

Every operator from SURVEY.md §2 is exercised here as a named query over
the testdata star schema, paired with an ANSI-SQL oracle that DuckDB runs
on the same parquet (``__spark_entry__.py`` re-exports both maps).

Conventions for oracle parity (SURVEY §7 hard parts):
- every aggregate / computed column is aliased identically on both sides;
- doubles are quantized ``floor(x*100 + 0.5)/100`` on both sides — pure
  IEEE-754 double math, bit-identical across engines (plain round(x,2)
  is NOT: it diverges on decimal-boundary values);
- DuckDB ``sum(int)`` returns HUGEINT and ``year()`` BIGINT → oracle SQL
  casts to BIGINT/INTEGER to match Spark's LongType/IntegerType;
- deterministic keep-policies everywhere (row_number + full tie-break),
  never ``dropDuplicates``' arbitrary row.

Each query is built from the operator library (operators/*, functions/*)
rather than ad-hoc code, so the oracle checks the *library*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import aggregates as agg_ops
from .operators import cleaning, derive, joins, setops, windows
from .registry import ORACLE, QUERIES, quantize, query
from .tables import load_table

_r2 = quantize  # 2-decimal engine-agnostic quantizer (see registry)


# ---------------------------------------------------------------------------
# Flagship + aggregation suite (SURVEY §2.D)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100.0                                        AS sum_qty,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100.0                                   AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100.0                AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100.0  AS sum_charge,
           floor((avg(l_quantity)) * 100 + 0.5) / 100.0                                        AS avg_qty,
           floor((avg(l_extendedprice)) * 100 + 0.5) / 100.0                                   AS avg_price,
           floor((avg(l_discount)) * 100 + 0.5) / 100.0                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY §7 step 1): TPC-H-Q1-shaped pricing summary — the
    exact shape of the reference's daily aggregate A1
    (silver_processor.py:279-290) on the provided testdata.

    Plan shape at scale: parquet scan with pushed l_shipdate filter →
    partial hash agg (map-side) → single shuffle on 2 low-cardinality
    keys → final agg. No UDFs; one shuffle total.
    """
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity"), "sum_qty"),
            _r2(F.sum("l_extendedprice"), "sum_base_price"),
            _r2(F.sum(disc_price), "sum_disc_price"),
            _r2(F.sum(disc_price * (1 + F.col("l_tax"))), "sum_charge"),
            _r2(F.avg("l_quantity"), "avg_qty"),
            _r2(F.avg("l_extendedprice"), "avg_price"),
            _r2(F.avg("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "daily_agg",
    """
    SELECT event_type,
           CAST(year(ts) AS INTEGER)  AS year,
           CAST(month(ts) AS INTEGER) AS month,
           CAST(day(ts) AS INTEGER)   AS day,
           floor((avg(value)) * 100 + 0.5) / 100.0 AS avg_value,
           floor((min(value)) * 100 + 0.5) / 100.0 AS min_value,
           floor((max(value)) * 100 + 0.5) / 100.0 AS max_value,
           count(*)             AS record_count
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
)
def daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — daily-grain hash aggregate (silver_processor.py:279-290):
    groupBy(entity, year, month, day) with avg/min/max/count measures."""
    ev = load_table(spark, "events", sf_dir)
    out = agg_ops.grain_aggregate(
        ev,
        ts_col="ts",
        grain=["year", "month", "day"],
        group_extra=["event_type"],
        measures=[
            ("avg", "value", "avg_value"),
            ("min", "value", "min_value"),
            ("max", "value", "max_value"),
            ("count", "*", "record_count"),
        ],
    )
    return out.select(
        "event_type", "year", "month", "day",
        _r2(F.col("avg_value"), "avg_value"),
        _r2(F.col("min_value"), "min_value"),
        _r2(F.col("max_value"), "max_value"),
        "record_count",
    )


@query(
    "hourly_agg",
    """
    SELECT event_type,
           CAST(year(ts) AS INTEGER)  AS year,
           CAST(month(ts) AS INTEGER) AS month,
           CAST(day(ts) AS INTEGER)   AS day,
           CAST(hour(ts) AS INTEGER)  AS hour,
           floor((avg(value)) * 100 + 0.5) / 100.0 AS avg_value,
           floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value,
           count(*)             AS record_count
    FROM events
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — hourly-grain aggregate (silver_processor.py:293-304)."""
    ev = load_table(spark, "events", sf_dir)
    out = agg_ops.grain_aggregate(
        ev,
        ts_col="ts",
        grain=["year", "month", "day", "hour"],
        group_extra=["event_type"],
        measures=[
            ("avg", "value", "avg_value"),
            ("sum", "value", "sum_value"),
            ("count", "*", "record_count"),
        ],
    )
    return out.select(
        "event_type", "year", "month", "day", "hour",
        _r2(F.col("avg_value"), "avg_value"),
        _r2(F.col("sum_value"), "sum_value"),
        "record_count",
    )


@query(
    "weekly_rollup",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(year(ts) AS INTEGER)  AS year,
               CAST(month(ts) AS INTEGER) AS month,
               CAST(day(ts) AS INTEGER)   AS day,
               avg(value) AS avg_value,
               min(value) AS min_value,
               max(value) AS max_value,
               count(*)   AS record_count
        FROM events GROUP BY 1, 2, 3, 4
    )
    SELECT event_type,
           year,
           CAST(weekofyear(make_date(year, month, day)) AS INTEGER) AS week_of_year,
           floor((avg(avg_value)) * 100 + 0.5) / 100.0         AS avg_value,
           floor((min(min_value)) * 100 + 0.5) / 100.0         AS min_value,
           floor((max(max_value)) * 100 + 0.5) / 100.0         AS max_value,
           CAST(sum(record_count) AS BIGINT) AS total_records
    FROM daily
    GROUP BY 1, 2, 3
    """,
)
def weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — multi-grain rollup: weekly re-aggregation of the daily
    aggregate with AVG-of-avg / MIN-of-min / SUM-of-count semantics
    (v_weekly_stats, schema.sql:226-239)."""
    ev = load_table(spark, "events", sf_dir)
    daily = agg_ops.grain_aggregate(
        ev,
        ts_col="ts",
        grain=["year", "month", "day"],
        group_extra=["event_type"],
        measures=[
            ("avg", "value", "avg_value"),
            ("min", "value", "min_value"),
            ("max", "value", "max_value"),
            ("count", "*", "record_count"),
        ],
    ).withColumn("week_of_year", F.weekofyear(F.make_date("year", "month", "day")))
    weekly = agg_ops.reaggregate(
        daily,
        keys=["event_type", "year", "week_of_year"],
        measures=[
            ("avg", "avg_value", "avg_value"),
            ("min", "min_value", "min_value"),
            ("max", "max_value", "max_value"),
            ("sum", "record_count", "total_records"),
        ],
    )
    return weekly.select(
        "event_type", "year", "week_of_year",
        _r2(F.col("avg_value"), "avg_value"),
        _r2(F.col("min_value"), "min_value"),
        _r2(F.col("max_value"), "max_value"),
        "total_records",
    )


@query(
    "day_night_agg",
    """
    SELECT CAST(ts AS DATE)   AS event_date,
           value >= 250.0     AS is_high,
           floor((avg(value)) * 100 + 0.5) / 100.0 AS avg_value,
           count(*)             AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def day_night_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — group-by over expressions (v_day_night_comparison,
    schema.sql:242-252): GROUP BY DATE(ts) and a boolean flag column
    (P9's flag as a grouping key)."""
    ev = load_table(spark, "events", sf_dir)
    out = agg_ops.group_by_expression(
        ev,
        exprs={
            "event_date": F.to_date("ts"),
            "is_high": F.col("value") >= 250.0,
        },
        measures=[("avg", "value", "avg_value"), ("count", "*", "n")],
    )
    return out.select("event_date", "is_high", _r2(F.col("avg_value"), "avg_value"), "n")


@query(
    "distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — COUNT(DISTINCT) per group (schema.sql:305-306). The exact
    form is oracle-checked; the 100 TB path is approx_count_distinct
    (see ``distinct_users_approx``, rows-only checked)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "distinct_users_approx",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY 1
    """,
)
def distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 at scale — HLL approx_count_distinct (SURVEY §2.D): one pass,
    no per-group distinct-value shuffle. Sketch estimates are
    engine-specific, so the driver-checked output is the EXACT count
    plus ``approx_within_5pct``: TRUE iff the HLL estimate (rsd 0.01,
    so 5% = 5σ) is within 5% of it — a broken sketch flips the boolean
    and fails the value-hash while a healthy one never can."""
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.01).alias("n_approx"),
    )
    ok = (
        F.abs(F.col("n_approx") - F.col("n_users"))
        <= F.col("n_users") * F.lit(0.05)
    )
    return agg.select("event_type", "n_users", ok.alias("approx_within_5pct"))


@query(
    "dup_groups",
    """
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY 1, 2 HAVING count(*) > 1
    """,
)
def dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/Q2 — duplicate-key detector (weather_pipeline_dag.py:193-198)."""
    ev = load_table(spark, "events", sf_dir)
    return agg_ops.duplicate_groups(ev, ["user_id", "event_type"])


@query(
    "null_counts",
    """
    SELECT CAST(COALESCE(sum(CASE WHEN CASE WHEN value < 50 THEN NULL ELSE value END IS NULL
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS nulls_value_opt,
           CAST(COALESCE(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS nulls_user_id,
           count(*) AS n_rows
    FROM events
    """,
)
def null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A8/Q3 — single-pass null-count probe (weather_pipeline_dag.py:
    205-210). Testdata has no natural nulls, so an optional column is
    derived (value<50 → NULL) to exercise the operator for real."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "value_opt", F.when(F.col("value") < 50, None).otherwise(F.col("value"))
    )
    return agg_ops.null_counts(ev, ["value_opt", "user_id"])


@query(
    "quality_scores",
    """
    WITH scored AS (
        SELECT 100
               - 10 * (CASE WHEN (CASE WHEN value < 50 THEN NULL ELSE value END) IS NULL THEN 1 ELSE 0 END)
               - 10 * (CASE WHEN (CASE WHEN value > 450 THEN NULL ELSE value END) IS NULL THEN 1 ELSE 0 END)
               AS quality_score
        FROM events
    )
    SELECT quality_score, count(*) AS n FROM scored GROUP BY 1
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/Q6 — per-row quality score, 100 minus 10 per null among optional
    fields (silver_processor.py:203-220), rolled up to a score histogram.
    Optional columns derived from value thresholds (testdata is null-free)."""
    ev = load_table(spark, "events", sf_dir).withColumns(
        {
            "f1": F.when(F.col("value") < 50, None).otherwise(F.col("value")),
            "f2": F.when(F.col("value") > 450, None).otherwise(F.col("value")),
        }
    )
    scored = ev.select(cleaning.quality_score(["f1", "f2"]).cast("int").alias("quality_score"))
    return scored.groupBy("quality_score").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Cleaning / projection / dedup (SURVEY §2.B)
# ---------------------------------------------------------------------------


@query(
    "clean_filter",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_shipdate AS DATE) AS ship_date,
           floor((l_quantity) * 100 + 0.5) / 100.0     AS l_quantity
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_shipdate IS NOT NULL
      AND l_quantity BETWEEN 10 AND 40
    """,
)
def clean_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3 — the Silver cleaning chain: required-column null filter
    (silver_processor.py:177-182), range predicate (:185-188), type-cast
    projection (:170-174). All three push down to the parquet scan."""
    li = load_table(spark, "lineitem", sf_dir)
    cleaned = cleaning.drop_null_rows(li, ["l_quantity", "l_shipdate"])
    cleaned = cleaning.range_filter(cleaned, "l_quantity", 10, 40)
    return cleaned.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_date"),
        _r2(F.col("l_quantity"), "l_quantity"),
    )


@query(
    "dedup_latest",
    """
    SELECT user_id, event_type, event_id, floor((value) * 100 + 0.5) / 100.0 AS value
    FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (deterministic variant) — dedup on (user_id, event_type) keeping
    the latest row under (ts DESC, event_id DESC). The reference keeps an
    arbitrary row (silver_processor.py:191); the engine standardizes on
    the reproducible row_number()=1 form (SURVEY §7 hard parts)."""
    ev = load_table(spark, "events", sf_dir)
    out = cleaning.dedup_deterministic(
        ev, ["user_id", "event_type"], [F.desc("ts"), F.desc("event_id")]
    )
    return out.select("user_id", "event_type", "event_id", _r2(F.col("value"), "value"))


@query(
    "idempotent_append",
    """
    SELECT o_orderkey, o_custkey, floor((o_totalprice) * 100 + 0.5) / 100.0 AS o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderkey NOT IN (
          SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    """,
)
def idempotent_append_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 — idempotent upsert as a left-anti join: new rows (orders from
    1998+) minus rows already in the target (orders from 1999+), i.e. the
    engine-native form of append-under-UNIQUE-index-and-swallow-errors
    (gold_loader.py:296-319, schema.sql:86)."""
    orders = load_table(spark, "orders", sf_dir)
    new_rows = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    existing = orders.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    out = cleaning.idempotent_append(new_rows, existing, ["o_orderkey"])
    return out.select("o_orderkey", "o_custkey", _r2(F.col("o_totalprice"), "o_totalprice"))


@query(
    "derived_columns",
    """
    SELECT event_id,
           floor((value + 0.5555 * (value / 100.0 - 1.0)) * 100 + 0.5) / 100.0 AS heat_index,
           CAST(dayofweek(ts) + 1 AS INTEGER) IN (1, 7)     AS is_weekend,
           value BETWEEN 100 AND 400                        AS in_band
    FROM events
    """,
)
def derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7-P10 — formula column (heat index, silver_processor.py:255-264),
    set-membership flag (is_weekend, :242), interval-containment flag
    (:245-251), all as codegen'd column math. DuckDB dayofweek is
    0=Sunday vs Spark 1=Sunday, hence the +1 in the oracle."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        _r2(derive.heat_index("value", "value"), "heat_index"),
        derive.flag_in_set(F.dayofweek("ts"), [1, 7]).alias("is_weekend"),
        F.col("value").between(100, 400).alias("in_band"),
    )


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.E)
# ---------------------------------------------------------------------------


@query(
    "latest_per_user",
    """
    SELECT user_id, ts, event_type, event_id
    FROM (
        SELECT user_id, ts, event_type, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — latest row per key (v_latest_weather's DISTINCT ON,
    schema.sql:211-223), standardized on row_number()=1."""
    ev = load_table(spark, "events", sf_dir)
    out = windows.latest_per_key(ev, ["user_id"], "ts", tiebreak=["event_id"])
    return out.select("user_id", "ts", "event_type", "event_id")


@query(
    "running_total",
    """
    SELECT o_custkey, o_orderkey,
           floor((sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100.0
               AS running_spend
    FROM orders
    """,
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with an explicit rows frame (SURVEY §2.E declared
    capability: running sum of o_totalprice per customer)."""
    orders = load_table(spark, "orders", sf_dir)
    out = windows.running_sum(
        orders, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")],
        "o_totalprice", alias="running_spend",
    )
    return out.select("o_custkey", "o_orderkey", _r2(F.col("running_spend"), "running_spend"))


@query(
    "lag_delta",
    """
    SELECT event_id, user_id,
           floor((value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)) * 100 + 0.5) / 100.0 AS delta
    FROM events
    """,
)
def lag_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead — per-user delta of value over event time (SURVEY §2.E)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    return ev.select(
        "event_id", "user_id",
        _r2(F.col("value") - F.lag("value").over(w), "delta"),
    )


@query(
    "top_customers_per_segment",
    """
    SELECT c_mktsegment, c_custkey, floor((c_acctbal) * 100 + 0.5) / 100.0 AS c_acctbal
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 5
    """,
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — ranking window (SURVEY §2.E ∅→native; §2.G O2)."""
    cust = load_table(spark, "customer", sf_dir)
    out = windows.top_k_per_group(
        cust, ["c_mktsegment"], [F.desc("c_acctbal"), F.asc("c_custkey")], 5
    )
    return out.select("c_mktsegment", "c_custkey", _r2(F.col("c_acctbal"), "c_acctbal"))


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.F)
# ---------------------------------------------------------------------------


@query(
    "star_revenue",
    """
    SELECT r_name, n_name,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100.0 AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)
def star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.F — the canonical star join with broadcast dimensions: revenue
    per region/nation. Only lineitem⋈orders shuffles; customer/nation/
    region broadcast (F.broadcast), so the fact table moves once."""
    joined = joins.star_join(
        load_table(spark, "lineitem", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "customer", sf_dir),
        load_table(spark, "nation", sf_dir),
        load_table(spark, "region", sf_dir),
    )
    return joined.groupBy("r_name", "n_name").agg(
        _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"),
        F.count("*").alias("n_lineitems"),
    )


@query(
    "semi_join_customers",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi — EXISTS: customers with at least one urgent order,
    counted per segment."""
    cust = load_table(spark, "customer", sf_dir)
    urgent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    out = joins.semi_join(cust, urgent, "c_custkey")
    return out.groupBy("c_mktsegment").agg(F.count("*").alias("n_customers"))


@query(
    "anti_join_customers",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti — NOT EXISTS: customers with no urgent order (the S14
    idempotent-load filter shape, gold_loader.py:296-319)."""
    cust = load_table(spark, "customer", sf_dir)
    urgent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return joins.anti_join(cust, urgent, "c_custkey").select("c_custkey", "c_name")


@query(
    "range_join_late_ships",
    """
    SELECT o_orderpriority, count(*) AS n_late
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def range_join_late_ships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join (§2.F, the join form of P10): lineitems shipped
    >90 days after their order date. Equi key (l_orderkey) keeps it a
    hash join; the range predicate applies as a post-join filter — no
    nested-loop explosion."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    # interval arithmetic, not date_add: date_add TRUNCATES a timestamp
    # to a date, silently shifting the threshold when order dates carry
    # time-of-day (the oracle's + INTERVAL preserves it; review r6)
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    out = joins.range_join(li, orders, cond, broadcast_right=False)
    return out.groupBy("o_orderpriority").agg(F.count("*").alias("n_late"))


@query(
    "asof_join_purchases",
    """
    SELECT e.event_id, e.user_id, e.ts,
           floor((p.value) * 100 + 0.5) / 100.0 AS last_purchase_value
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND p.ts <= e.ts
    WHERE e.event_type = 'click'
    """,
)
def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (§2.F): for each click, the user's latest purchase value
    at or before the click. Union+window formulation — one shuffle on
    user_id, scales to both sides large (no per-group pandas)."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = joins.asof_join(
        clicks, purchases, key="user_id", fact_ts="ts", quote_ts="ts",
        quote_cols=["purchase_value"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        _r2(F.col("purchase_value"), "last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops (SURVEY §2.G/§2.H)
# ---------------------------------------------------------------------------


@query(
    "top10_orders",
    """
    SELECT o_orderkey, o_custkey, floor((o_totalprice) * 100 + 0.5) / 100.0 AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 — global top-k via orderBy().limit() — plans as
    TakeOrderedAndProject (per-partition heap, no global sort)."""
    orders = load_table(spark, "orders", sf_dir)
    out = setops.top_k(orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], 10)
    return out.select("o_orderkey", "o_custkey", _r2(F.col("o_totalprice"), "o_totalprice"))


@query(
    "table_stats",
    """
    SELECT 'region' AS table_name, count(*) AS row_count FROM region
    UNION ALL SELECT 'nation', count(*) FROM nation
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'part', count(*) FROM part
    """,
)
def table_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — UNION ALL of scalar aggregates (get_database_stats,
    schema.sql:295-309)."""
    return setops.table_stats(
        {n: load_table(spark, n, sf_dir) for n in ("region", "nation", "customer", "supplier", "part")}
    )


@query(
    "custkeys_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def custkeys_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (§2.H ∅→native): high-balance customers ∩ urgent-order
    customers."""
    rich = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    urgent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return setops.intersect(rich, urgent)


@query(
    "custkeys_except",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def custkeys_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (§2.H ∅→native): high-balance customers with no urgent order."""
    rich = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
        .distinct()
    )
    urgent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return rich.exceptAll(urgent)


# ---------------------------------------------------------------------------
# Rollup / cube / grouping sets (SURVEY §2.D ∅→native)
# ---------------------------------------------------------------------------


@query(
    "rollup_quantity",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100.0 AS sum_qty,
           count(*) AS n,
           grouping_id(l_returnflag, l_linestatus) AS grouping_id
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — hierarchical subtotals + grand total with grouping_id
    (SURVEY §2.D gap list → engine-native)."""
    li = load_table(spark, "lineitem", sf_dir)
    out = agg_ops.rollup_aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        [("sum", "l_quantity", "sum_qty"), ("count", "*", "n")],
        mode="rollup",
    )
    return out.select(
        "l_returnflag", "l_linestatus",
        _r2(F.col("sum_qty"), "sum_qty"), "n",
        F.col("grouping_id").cast("bigint").alias("grouping_id"),
    )


@query(
    "cube_quantity",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100.0 AS sum_qty,
           grouping_id(l_returnflag, l_linestatus) AS grouping_id
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping combinations (SURVEY §2.D gap list)."""
    li = load_table(spark, "lineitem", sf_dir)
    out = agg_ops.rollup_aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        [("sum", "l_quantity", "sum_qty")],
        mode="cube",
    )
    return out.select(
        "l_returnflag", "l_linestatus",
        _r2(F.col("sum_qty"), "sum_qty"),
        F.col("grouping_id").cast("bigint").alias("grouping_id"),
    )


# ---------------------------------------------------------------------------
# JSON / scalar functions (SURVEY §2.I)
# ---------------------------------------------------------------------------


@query(
    "json_props",
    """
    SELECT event_type,
           floor((avg(CAST(json_extract_string(props, '$.k') AS BIGINT))) * 100 + 0.5) / 100.0 AS avg_k,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — JSON path extraction from the events.props payload
    (get_json_object; reference parses raw JSON at kafka_consumer_s3.py:
    133). The declared-schema alternative is from_json(EVENT_PROPS)."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        _r2(F.avg(k), "avg_k"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Grouping sets + distribution statistics (SURVEY §2.D gap list → native)
# ---------------------------------------------------------------------------


@query(
    "grouping_sets_quantity",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100.0 AS sum_qty,
           grouping_id(l_returnflag, l_linestatus) AS grouping_id
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — two independent grains in ONE shuffle (the general
    form of rollup/cube; SURVEY §2.D gap list). At 100 TB this replaces
    two separate groupBy jobs over the same scan."""
    li = load_table(spark, "lineitem", sf_dir)
    out = agg_ops.grouping_sets_aggregate(
        li,
        [["l_returnflag"], ["l_linestatus"]],
        ["l_returnflag", "l_linestatus"],
        [("sum", "l_quantity", "sum_qty")],
    )
    return out.select(
        "l_returnflag", "l_linestatus",
        _r2(F.col("sum_qty"), "sum_qty"),
        F.col("grouping_id").cast("bigint").alias("grouping_id"),
    )


@query(
    "value_distribution",
    """
    SELECT event_type,
           floor((stddev_samp(value)) * 100 + 0.5) / 100.0 AS sd_value,
           floor((median(value)) * 100 + 0.5) / 100.0 AS med_value,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution stats (§2.D gap list): stddev + exact median per
    group. Exact median is a sort-based aggregate — fine per group here;
    the 100 TB path swaps in percentile_approx (t-digest, one pass,
    mergeable) when exactness isn't contractual."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        _r2(F.stddev_samp("value"), "sd_value"),
        _r2(F.median("value"), "med_value"),
        F.count("*").alias("n"),
    )


@query(
    "salted_agg_value",
    """
    SELECT event_type,
           floor((sum(value)) * 100 + 0.5) / 100.0 AS sum_value,
           floor((avg(value)) * 100 + 0.5) / 100.0 AS avg_value,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def salted_agg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-stage aggregate (operators/skew.py): groupBy(keys +
    salt) partials then merge — the manual fallback when one hot key
    straggles a task and AQE can't split it. The oracle is the PLAIN
    GROUP BY: salting must be semantically invisible (avg decomposes to
    sum/count so partial averages never get mis-weighted)."""
    from .operators import skew

    ev = load_table(spark, "events", sf_dir)
    out = skew.salted_aggregate(
        ev.select("event_type", "value"),
        ["event_type"],
        [("sum", "value", "sum_value"), ("avg", "value", "avg_value"),
         ("count", "*", "n")],  # count(*) — the oracle counts rows, not non-null values
    )
    return out.select(
        "event_type", _r2(F.col("sum_value"), "sum_value"),
        _r2(F.col("avg_value"), "avg_value"), F.col("n"),
    )


@query(
    "below_avg_quantity",
    """
    SELECT l_partkey,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100.0 AS small_order_revenue
    FROM lineitem l1
    WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    GROUP BY l_partkey
    """,
)
def below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape) — Catalyst
    decorrelates to an aggregate + self-join (SURVEY §4 "subquery
    decorrelation: built-in"); expressed via spark.sql to exercise the
    SQL entry point end-to-end."""
    li = load_table(spark, "lineitem", sf_dir)
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_partkey,
               CAST(floor(sum(l_extendedprice) * 100 + 0.5) AS DOUBLE) / 100.0
                   AS small_order_revenue
        FROM lineitem l1
        WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY l_partkey
        """
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot (reshaping surface)
# ---------------------------------------------------------------------------


@query(
    "pivot_event_values",
    """
    SELECT user_id,
           floor((coalesce(sum(CASE WHEN event_type = 'click'    THEN value END), 0)) * 100 + 0.5) / 100.0 AS click,
           floor((coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0)) * 100 + 0.5) / 100.0 AS purchase,
           floor((coalesce(sum(CASE WHEN event_type = 'view'     THEN value END), 0)) * 100 + 0.5) / 100.0 AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — long→wide reshaping: per-user value totals, one column per
    event type. Values list passed EXPLICITLY (pivot without it runs an
    extra distinct job over the key column — the 100 TB anti-pattern)."""
    ev = load_table(spark, "events", sf_dir)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.coalesce(F.sum("value"), F.lit(0.0)))
    )
    return out.select(
        "user_id", _r2(F.col("click"), "click"),
        _r2(F.col("purchase"), "purchase"), _r2(F.col("view"), "view"),
    )


@query(
    "unpivot_daily_measures",
    """
    WITH daily AS (
        SELECT CAST(year(ts) AS INTEGER) AS year,
               CAST(month(ts) AS INTEGER) AS month,
               CAST(dayofmonth(ts) AS INTEGER) AS day,
               avg(value) AS avg_value, max(value) AS max_value
        FROM events GROUP BY 1, 2, 3
    )
    SELECT year, month, day, measure,
           floor((val) * 100 + 0.5) / 100.0 AS val
    FROM daily
    UNPIVOT (val FOR measure IN (avg_value, max_value))
    """,
)
def unpivot_daily_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — wide→long reshaping of the daily measure columns
    (serving-layer export shape)."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.year("ts").alias("year"), F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("day"),
    ).agg(F.avg("value").alias("avg_value"), F.max("value").alias("max_value"))
    long = daily.unpivot(
        ["year", "month", "day"], ["avg_value", "max_value"], "measure", "val"
    )
    return long.select("year", "month", "day", "measure", _r2(F.col("val"), "val"))


@query(
    "clicks_near_purchases",
    """
    SELECT c.user_id AS click_user, count(*) AS n_nearby_purchases
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT ts FROM events WHERE event_type = 'purchase') p
      ON p.ts BETWEEN c.ts - INTERVAL 2 MINUTE AND c.ts + INTERVAL 2 MINUTE
    GROUP BY 1
    """,
)
def clicks_near_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with BOTH sides large and NO equi key (the shape a
    nested loop can't survive at 100 TB): purchases within ±2 minutes of
    any click, via time-bucket blocking (joins.time_bucket_range_join —
    hash join on tolerance-sized bins, exact predicate as post-filter)."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("ts")
    out = joins.time_bucket_range_join(
        clicks, purchases, "ts", "ts", tolerance_seconds=120,
        left_prefix="c_", right_prefix="p_",
    )
    return out.groupBy(F.col("c_user_id").alias("click_user")).agg(
        F.count("*").alias("n_nearby_purchases")
    )


@query(
    "user_sessions_batch",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY 1, 2
    """,
)
def user_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (30 min gap) — the oracle-checkable
    batch twin of `stream_session_30m` / `stream_user_sessions`
    (windows.sessionize: lag marks starts, running sum numbers sessions,
    both windows sharing one shuffle on user_id)."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id")
    s = windows.sessionize(
        ev, keys=["user_id"], ts_col="ts", gap_seconds=1800, tiebreak=["event_id"]
    )
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@query(
    "order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped: LEFT OUTER join (customers with zero orders must
    survive) -> per-customer count -> distribution of counts. Exercises
    outer-join null semantics (count(col) skips nulls) and a re-aggregation
    over an aggregate. At scale: the outer join shuffles on custkey; the
    second aggregate's key (c_count) is tiny -> partial agg collapses it
    map-side."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "big_orders",
    """
    SELECT c_name, o_orderkey,
           floor((t.total_qty) * 100 + 0.5) / 100.0 AS total_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300
    ) t ON o_orderkey = t.l_orderkey
    """,
)
def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: aggregate-then-join — large-quantity orders via a
    HAVING subquery joined back to orders and customer. The lineitem agg
    runs FIRST (shuffle on l_orderkey), shrinking the join's probe side to
    the qualifying keys; customer is broadcast. The wrong plan (join raw
    lineitem first, aggregate after) shuffles the full fact twice."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(qualifying, orders.o_orderkey == qualifying.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", _r2(F.col("total_qty"), "total_qty"))
    )


@query(
    "returned_orders_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
    )
    GROUP BY o_orderpriority
    """,
)
def returned_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped: EXISTS correlated subquery == LEFT SEMI join (one
    probe-side row per match regardless of multiplicity — an inner join
    would double-count orders with several returned lines). The semi join
    ships only l_orderkey from the filtered fact."""
    orders = load_table(spark, "orders", sf_dir)
    returned = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "value_percentiles",
    """
    SELECT event_type,
           floor((quantile_cont(value, 0.50)) * 100 + 0.5) / 100.0 AS p50,
           floor((quantile_cont(value, 0.90)) * 100 + 0.5) / 100.0 AS p90,
           floor((quantile_cont(value, 0.99)) * 100 + 0.5) / 100.0 AS p99
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (F.percentile == SQL
    percentile_cont == DuckDB quantile_cont, all linear interpolation).
    At 100 TB use approx_percentile instead (t-digest sketch, one pass,
    mergeable map-side) — the exact form materializes each group's values
    into the aggregation buffer."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        _r2(F.expr("percentile(value, 0.50)"), "p50"),
        _r2(F.expr("percentile(value, 0.90)"), "p90"),
        _r2(F.expr("percentile(value, 0.99)"), "p99"),
    )


@query(
    "value_histogram",
    """
    SELECT CAST(floor(value / 50.0) AS INTEGER) AS bucket,
           count(*) AS n,
           floor((min(value)) * 100 + 0.5) / 100.0 AS lo,
           floor((max(value)) * 100 + 0.5) / 100.0 AS hi
    FROM events
    GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram by pure column arithmetic (floor(value/width))
    — a groupBy on a derived low-cardinality key, fully map-side
    combinable. The portable form of width_bucket."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.floor(F.col("value") / 50.0).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            _r2(F.min("value"), "lo"),
            _r2(F.max("value"), "hi"),
        )
    )


@query(
    "union_schema_evolution",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM (
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE year(o_orderdate) < 1995
        UNION ALL BY NAME
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE year(o_orderdate) >= 1995
    )
    """,
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union — unionByName(allowMissingColumns=True)
    (SURVEY §2.H extension): a legacy extract lacking o_orderpriority
    unions with the current schema; missing columns become nulls, matched
    BY NAME not position (positional unionAll would silently misalign)."""
    orders = load_table(spark, "orders", sf_dir)
    legacy = orders.filter(F.year("o_orderdate") < 1995).select(
        "o_orderkey", "o_totalprice"
    )
    current = orders.filter(F.year("o_orderdate") >= 1995).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    return legacy.unionByName(current, allowMissingColumns=True)


@query(
    "top_supplier_revenue",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           floor((total_revenue) * 100 + 0.5) / 100.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped: per-supplier revenue aggregate filtered by a
    SCALAR subquery on its own maximum. The aggregate computes once and
    fans out (self-referencing subquery); the max collapses to one row
    and broadcasts back — no second scan of lineitem, no sort. (A window
    max over an empty partitionBy would serialize to one task — the
    scalar-subquery form keeps it a two-row-ish broadcast.)"""
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("m"))
    out = (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
    )
    return out.select("s_suppkey", "s_name", _r2(F.col("total_revenue"), "total_revenue"))


@query(
    "nation_trade_flows",
    """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2))))
                      AS DOUBLE) * 100 + 0.5) / 100.0 AS volume
    FROM lineitem
    JOIN orders    ON o_orderkey = l_orderkey
    JOIN customer  ON c_custkey = o_custkey
    JOIN supplier  ON s_suppkey = l_suppkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
    WHERE ns.n_name <> nc.n_name
    GROUP BY 1, 2, 3
    """,
)
def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped: ROLE-PLAYING dimension — the nation table joins
    TWICE under different roles (supplier's nation vs customer's nation),
    each role broadcast independently; cross-nation flows only. The fact
    side shuffles once for orders (fact x fact), every dimension is a
    broadcast — the multi-role pattern behind currency/date/geography
    dims in real star schemas."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    # Exact decimal arithmetic INTERNALLY (casting the inputs, not the
    # double product, keeps every multiply/sum exact and order-
    # insensitive), but the OUTPUT is a quantized double: DuckDB's
    # pandas path floats DECIMAL columns to float64 while Spark collects
    # Decimal objects, so a decimal output column can never hash-match
    # across engines even when all values are identical (round-2
    # verdict). Exact decimal → double is the same nearest-double on
    # both engines; the floor quantize is then bit-identical.
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    vol = F.sum(ep * (F.lit(1).cast("decimal(12,2)") - disc)).cast("double")
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("o_orderdate").alias("order_year")
    ).agg(quantize(vol, "volume", 2))


@query(
    "json_props_variant",
    """
    SELECT event_type,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 via Spark 4 VARIANT: parse_json once into the binary variant
    encoding, then typed path extraction (variant_get). Against
    get_json_object (json_props), variant parses each payload ONCE and
    fields come out pre-shredded — with several extractions per payload
    the string is re-parsed per path, the variant is not. The oracle is
    plain SQL json_extract (values must agree regardless of encoding)."""
    ev = load_table(spark, "events", sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.max("k").alias("max_k"),
        F.min("k").alias("min_k"),
        F.count("*").alias("n"),
    )
