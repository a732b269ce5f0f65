"""Statistical / time-series / retrieval analytics queries (round 2).

Widens the engine surface beyond SURVEY §2 with the analytics a serving
layer over the reference's gold tables would grow next (the reference
stops at avg/min/max/count — silver_processor.py:279-304 — and its SQL
views schema.sql:211-252): higher moments, exact quantiles, the full
ranking-function family, windowed time series (moving average, calendar
gap-fill + forward-fill), classic disjunctive-predicate and
scalar-subquery join shapes (TPC-H Q14/Q19/Q22 forms), and
training-corpus statistics (TF-IDF, curriculum binning, source mixture).

Oracle-parity conventions follow queries.py: identical aliases both
sides, doubles quantized via the engine-agnostic floor form, integer
casts where DuckDB widens, deterministic tie-breaks on every ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as textfn
from .localrel import local_frame
from .registry import quantize, query
from .tables import load_table

_SQL_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


# ---------------------------------------------------------------------------
# Higher statistical moments (extends SURVEY §2.D beyond avg/min/max/count)
# ---------------------------------------------------------------------------


@query(
    "stat_moments",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT)                  AS n,
             stddev_samp(l_quantity)                   AS sd,
             var_samp(l_quantity)                      AS var,
             corr(l_quantity, l_extendedprice)         AS co,
             covar_samp(l_quantity, l_extendedprice)   AS cv,
             avg(l_quantity)                           AS m1,
             avg(l_quantity * l_quantity)              AS m2,
             avg(l_quantity * l_quantity * l_quantity) AS m3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           floor(sd * 10000 + 0.5) / 10000.0 AS sd_qty,
           floor(var * 10000 + 0.5) / 10000.0 AS var_qty,
           floor(co * 10000 + 0.5) / 10000.0 AS corr_qty_price,
           floor(cv * 100 + 0.5) / 100.0 AS covar_qty_price,
           floor((CASE WHEN m2 - m1*m1 > 0
                  THEN (m3 - 3*m1*m2 + 2*m1*m1*m1) / ((m2 - m1*m1) ^ 1.5)
                  END) * 10000 + 0.5) / 10000.0
             AS skew_qty
    FROM m
    """,
)
def stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second/third moments + bivariate stats per return flag.

    stddev_samp / var_samp / corr / covar_samp share one textbook
    definition across engines; skewness does NOT (Spark = population
    m3/m2^1.5, DuckDB = bias-corrected sample), so it is computed from
    raw moments with one explicit formula on both sides.

    Scale: one partial+final hash agg on a 3-value key — all moment
    accumulators combine map-side, a single O(groups) shuffle.
    """
    from .operators.aggregates import safe_corr

    li = load_table(spark, "lineitem", sf_dir)
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    # safe_corr, not the builtin: NULL on a zero-variance group like
    # DuckDB's corr, instead of the ANSI DIVIDE_BY_ZERO crash
    # (review r6, 10th pass)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.stddev_samp(q).alias("sd"),
        F.var_samp(q).alias("var"),
        safe_corr(q, p).alias("co"),
        F.covar_samp(q, p).alias("cv"),
        F.avg(q).alias("m1"),
        F.avg(q * q).alias("m2"),
        F.avg(q * q * q).alias("m3"),
    )
    m1, m2, m3 = F.col("m1"), F.col("m2"), F.col("m3")
    # zero/negative variance ⇒ NULL (guarded on BOTH engines): under
    # ANSI 0/0 crashes, and a rounding-negative variance would yield
    # pow(neg, 1.5) = NaN on Spark vs NaN-with-different-floor on DuckDB
    var_term = m2 - m1 * m1
    skew = F.when(
        var_term > 0,
        (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var_term, 1.5),
    )
    return m.select(
        "l_returnflag",
        "n",
        quantize(F.col("sd"), "sd_qty", 4),
        quantize(F.col("var"), "var_qty", 4),
        quantize(F.col("co"), "corr_qty_price", 4),
        quantize(F.col("cv"), "covar_qty_price", 2),
        quantize(skew, "skew_qty", 4),
    )


@query(
    "median_quartiles",
    """
    SELECT event_type,
           floor(quantile_cont(value, 0.25) * 10000 + 0.5) / 10000.0 AS q1,
           floor(quantile_cont(value, 0.50) * 10000 + 0.5) / 10000.0 AS med,
           floor(quantile_cont(value, 0.75) * 10000 + 0.5) / 10000.0 AS q3
    FROM events GROUP BY event_type
    """,
)
def median_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles per event type (the exact twin of
    ``value_percentiles_approx``). Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the linear-interpolation-at-(n-1)p rule.

    Scale: exact percentiles buffer each group's values — correct for
    the contract check; at 100 TB the approx_percentile twin (mergeable
    KLL-style sketch, map-side combine) is the production path.
    """
    ev = load_table(spark, "events", sf_dir)
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.25, 0.5, 0.75))").alias("pct")
    )
    return pct.select(
        "event_type",
        quantize(F.element_at("pct", 1), "q1", 4),
        quantize(F.element_at("pct", 2), "med", 4),
        quantize(F.element_at("pct", 3), "q3", 4),
    )


# ---------------------------------------------------------------------------
# Ranking-function family (extends SURVEY §2.E beyond row_number/rank/lag)
# ---------------------------------------------------------------------------


@query(
    "segment_rank_family",
    """
    WITH totals AS (
      SELECT c.c_mktsegment, o.o_custkey,
             floor(sum(o.o_totalprice) * 100 + 0.5) / 100.0 AS total
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, o.o_custkey
    )
    SELECT c_mktsegment, o_custkey, total,
           CAST(rank()       OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0 AS prnk,
           floor(cume_dist()    OVER w * 1000000 + 0.5) / 1000000.0 AS cdist,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM totals
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY total DESC, o_custkey)
    """,
)
def segment_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking surface — rank / dense_rank / percent_rank /
    cume_dist / ntile — over customer spend within market segment.

    Ordering is on the *quantized* total plus the key, so the window
    order is bit-identical across engines (a raw double sum could flip
    near-ties). Partitioned by segment: each partition ranks
    independently — the scalable form of ranking (a global ORDER BY
    window collapses to one task; partition-scoped ranking does not).
    """
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    totals = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(quantize(F.sum("o_totalprice"), "total", 2))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("total"), F.asc("o_custkey"))
    return totals.select(
        "c_mktsegment",
        "o_custkey",
        "total",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        quantize(F.percent_rank().over(w), "prnk", 6),
        quantize(F.cume_dist().over(w), "cdist", 6),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Windowed time series (moving average, calendar gap-fill + forward fill)
# ---------------------------------------------------------------------------


@query(
    "moving_avg_7d",
    """
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100.0 AS rev
      FROM lineitem GROUP BY 1
    )
    SELECT d, rev,
           floor(avg(rev) OVER (
               ORDER BY date_diff('day', DATE '1970-01-01', d)
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) * 100 + 0.5) / 100.0 AS ma7
    FROM daily
    """,
)
def moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily revenue — a RANGE frame
    keyed on the epoch-day number, so calendar gaps shrink the window
    (unlike a ROWS frame, which would silently span gaps).

    Scale: the window runs over the *pre-aggregated* daily series, whose
    cardinality is bounded by the calendar (~2.5k rows for 7 years)
    regardless of fact-table size — the unpartitioned window is safe at
    any scale because the heavy reduction (one shuffle, map-side
    combine) happens first.
    """
    li = load_table(spark, "lineitem", sf_dir)
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(quantize(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "rev", 2))
    )
    day_nr = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(day_nr).rangeBetween(-6, 0)
    return daily.select("d", "rev", quantize(F.avg("rev").over(w), "ma7", 2))


@query(
    "gap_fill_ffill",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             floor(sum(value) * 100 + 0.5) / 100.0 AS v
      FROM events GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
    cal AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      FROM spans
    ),
    j AS (SELECT cal.user_id, cal.d, daily.v FROM cal LEFT JOIN daily USING (user_id, d))
    SELECT user_id, d,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_ff,
           v IS NULL AS is_filled
    FROM j
    """,
)
def gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + forward fill per user: densify each user's
    daily series over their own [min(d), max(d)] span (sequence +
    explode), then carry the last observed value forward
    (``last(..., ignorenulls)`` over a running frame).

    Scale: everything is keyed by user_id — the explode fans out to at
    most span-days rows per user, the join and window are co-partitioned
    on user_id (one shuffle reused), no global ordering anywhere.
    """
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        quantize(F.sum("value"), "v", 2)
    )
    spans = daily.groupBy("user_id").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    cal = spans.select("user_id", F.explode(F.sequence("d0", "d1")).alias("d"))
    j = cal.join(daily, ["user_id", "d"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "d",
        F.last("v", ignorenulls=True).over(w).alias("v_ff"),
        F.col("v").isNull().alias("is_filled"),
    )


# ---------------------------------------------------------------------------
# Classic join shapes (TPC-H Q14 / Q19 / Q22 forms on the available columns)
# ---------------------------------------------------------------------------


@query(
    "promo_revenue",
    """
    SELECT floor((100.0 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                  / sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000.0
             AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from promo parts —
    a conditional aggregate over a fact⋈dim join.

    Scale: the tight l_shipdate range is pushed to the parquet scan
    (row-group min/max skipping does most of the work), part is
    broadcast, and the two sums reduce map-side to a single row — no
    shuffle of fact rows at all.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0)))
    return joined.agg(quantize(100.0 * promo / F.sum(disc_price), "promo_pct", 4))


@query(
    "brand_size_revenue",
    """
    SELECT floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
       OR (p_brand = 'Brand#2'  AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
)
def brand_size_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of per-brand (size, quantity) bands
    spanning both join sides.

    Scale: Catalyst CNF-converts the OR so the derivable per-table
    conjuncts (l_quantity ∈ [1,50], p_size ∈ [1,50], brand ∈ set) push
    below the join; part broadcasts; the residual disjunction evaluates
    post-join inside codegen. Single map-side-reduced scalar — no
    shuffle of fact rows.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#4") & sz.between(1, 15) & q.between(1, 20))
        | ((br == "Brand#2") & sz.between(10, 30) & q.between(10, 40))
        | ((br == "Brand#19") & sz.between(20, 50) & q.between(20, 50))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(quantize(F.sum(disc_price), "revenue", 2))


@query(
    "rich_inactive_customers",
    """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           floor(sum(c_acctbal) * 100 + 0.5) / 100.0 AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
)
def rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape on the available columns: customers with
    above-average positive balance and no orders, summarized by nation.

    Scale: the scalar average stays *inside the plan* as a broadcast
    1-row cross join (no driver collect); the no-orders test is a
    left-anti join (shuffle on custkey, or broadcast of the distinct
    custkey set when it fits); nation is broadcast.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    inactive = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        inactive.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            quantize(F.sum("c_acctbal"), "totacctbal", 2),
        )
    )


# ---------------------------------------------------------------------------
# Training-corpus statistics (TF-IDF, curriculum binning, source mixture)
# ---------------------------------------------------------------------------


@query(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             floor(tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0) * 1000000 + 0.5)
               / 1000000.0 AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf =
    ln((1+N)/(1+df)) + 1, sklearn's convention).

    All inputs to the score are exact integers (tf, df, N), so the
    double score is bit-reproducible; ranking orders by the quantized
    score with a token tie-break.

    Scale: two corpus-wide aggregations (tf on (doc,tok), df on tok) —
    each one shuffle with map-side combine; N joins as a broadcast
    1-row relation (in-plan, no collect); final top-k is a window
    partitioned by doc_id, never a global sort. The df relation is
    vocabulary-sized — at 100 TB it stays a sort-merge join on tok
    unless the vocabulary fits a broadcast.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(textfn.tokens("text")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "tok", quantize(F.col("tf") * idf, "tfidf", 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf")
    )


@query(
    "length_deciles",
    """
    WITH binned AS (
      SELECT n_chars,
             CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INT) AS decile
      FROM documents
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           floor(avg(n_chars) * 100 + 0.5) / 100.0 AS avg_chars
    FROM binned GROUP BY decile
    """,
)
def length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: documents bucketed into length deciles
    (ntile over a deterministic order), then per-decile stats — the
    standard way to stage training data from short to long sequences.

    Scale note: the decile cut runs through `ranks.exact_ntile` —
    quantile-bucketed, bucket-partitioned local windows plus a tiny
    offset join — EXACT ntile semantics with no single-task global
    window (r8, replacing the unpartitioned ntile the r7 verdict
    flagged).
    """
    from .operators import ranks

    docs = load_table(spark, "documents", sf_dir)
    binned = ranks.exact_ntile(
        docs.select("n_chars", "doc_id"),
        [("n_chars", "asc"), ("doc_id", "asc")],
        10,
        out="decile",
    )
    return binned.groupBy("decile").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        quantize(F.avg("n_chars"), "avg_chars", 2),
    )


@query(
    "source_mixture",
    f"""
    WITH per_src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           floor((n_tokens * 1.0 / sum(n_tokens) OVER ()) * 1000000 + 0.5) / 1000000.0
             AS token_share,
           floor(least(1.0, (1.0 / count(*) OVER ())
                            / (n_tokens * 1.0 / sum(n_tokens) OVER ())) * 1000000 + 0.5)
             / 1000000.0 AS sample_rate
    FROM per_src
    """,
)
def source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planning: per-source token share and the sampling
    rate that flattens the mixture to uniform across sources
    (rate = min(1, target_share / actual_share)) — the computation
    behind down-sampling over-represented domains in a training corpus.

    Scale: the heavy pass is one hash agg keyed by source; the totals
    come from a broadcast 1-row agg over the aggregated relation
    (no single-task window stage, r8).
    """
    docs = load_table(spark, "documents", sf_dir)
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(textfn.token_count("text")).cast("bigint").alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("__tok_tot"),
        F.count("*").alias("__n_src"),
    )
    per_src = per_src.crossJoin(F.broadcast(tot))
    share = F.col("n_tokens") / F.col("__tok_tot")
    target = 1.0 / F.col("__n_src")
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        quantize(share, "token_share", 6),
        quantize(F.least(F.lit(1.0), target / share), "sample_rate", 6),
    )


# ---------------------------------------------------------------------------
# String-function suite (extends SURVEY §2.I — the reference uses only
# lower/contains/concat, gold_loader.py:313, schema.sql:264)
# ---------------------------------------------------------------------------


@query(
    "string_suite",
    """
    SELECT p_partkey,
           TRY_CAST(regexp_extract(p_brand, '(\\d+)', 1) AS INT) AS brand_num,
           upper(p_name)                 AS name_upper,
           lpad(p_name, 16, '*')         AS name_padded,
           reverse(p_name)               AS name_rev,
           split_part(p_name, ' ', 1)    AS first_word,
           substr(p_name, 2, 3)          AS name_mid,
           CAST(levenshtein(p_name, lower(p_type)) AS INT) AS lev_name_type,
           replace(p_name, ' ', '_')     AS name_snake
    FROM part
    """,
)
def string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface in one projection: regexp capture,
    case mapping, padding, reversal, field splitting, substring, edit
    distance, replacement — each a Catalyst expression DuckDB defines
    identically.

    Scale: pure narrow projection inside whole-stage codegen — no
    shuffle, no UDF; cost is a single scan.
    """
    part = load_table(spark, "part", sf_dir)
    name = F.col("p_name")
    return part.select(
        "p_partkey",
        # try_cast (both engines): a digitless brand extracts '' and a plain
        # ANSI cast CRASHES the whole projection (review r6, 10th pass)
        F.regexp_extract(F.col("p_brand"), r"(\d+)", 1).try_cast("int").alias("brand_num"),
        F.upper(name).alias("name_upper"),
        F.lpad(name, 16, "*").alias("name_padded"),
        F.reverse(name).alias("name_rev"),
        F.split_part(name, F.lit(" "), F.lit(1)).alias("first_word"),
        F.substring(name, 2, 3).alias("name_mid"),
        F.levenshtein(name, F.lower(F.col("p_type"))).cast("int").alias("lev_name_type"),
        F.replace(name, F.lit(" "), F.lit("_")).alias("name_snake"),
    )


# ---------------------------------------------------------------------------
# Batch 2: classic order-priority / returns shapes (TPC-H Q3 / Q10 forms),
# higher-order array functions, deterministic mode, mergeable HLL sketches
# ---------------------------------------------------------------------------


@query(
    "ship_priority",
    """
    SELECT l_orderkey,
           floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100.0 AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped-at-cutoff orders by revenue for
    one market segment (deterministic tie-break on date + orderkey).

    Scale: both date predicates push to the fact scans (row-group
    skipping), customer filters to one segment and BROADCASTS into
    orders, the orders⋈lineitem join shuffles on the shared orderkey,
    and the final top-10 is TakeOrderedAndProject — never a global sort.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")
    j = (
        orders.filter(F.col("o_orderdate") < cutoff)
        .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(li.filter(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(quantize(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue", 2))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "returned_revenue_by_customer",
    """
    SELECT c_custkey, c_name, n_name,
           floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100.0 AS revenue,
           floor(c_acctbal * 100 + 0.5) / 100.0 AS acctbal
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    in one quarter, with their nation.

    Scale: l_returnflag + the quarter range push to the scans; customer
    and nation broadcast; one shuffle joins the two fact sides on
    orderkey; the aggregate keys on custkey (+ carried dims) and top-20
    is TakeOrderedAndProject.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    j = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(quantize(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue", 2))
        .select(
            "c_custkey", "c_name", "n_name", "revenue",
            quantize(F.col("c_acctbal"), "acctbal", 2),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "embedding_norms",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           floor(sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                       FROM unnest(embedding) AS u(x))) * 10000 + 0.5) / 10000.0 AS l2_norm,
           floor((SELECT max(abs(CAST(x AS DOUBLE))) FROM unnest(embedding) AS u(x))
                 * 10000 + 0.5) / 10000.0 AS max_abs,
           floor((SELECT sum(CAST(x AS DOUBLE)) FROM unnest(embedding) AS u(x))
                 / len(embedding) * 10000 + 0.5) / 10000.0 AS mean_v
    FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector statistics via higher-order array functions — the
    UDF-free path for embedding math (SURVEY §2.K: the engine's
    pandas_udf surface exists for decode-style work, but norms/means
    stay in Catalyst): ``aggregate`` folds the squared sum, ``transform``
    maps |x|, all inside whole-stage codegen.

    Scale: narrow projection, no shuffle, no Python — the same
    expression shape the ANN queries use for their distance math.
    """
    emb = load_table(spark, "embeddings", sf_dir)
    xd = lambda x: x.cast("double")  # noqa: E731
    sq_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + xd(x) * xd(x)
    )
    abs_arr = F.transform("embedding", lambda x: F.abs(xd(x)))
    total = F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + xd(x))
    # empty-array guard (review r6, 10th pass): the oracle's scalar
    # subqueries sum over ZERO unnested rows → NULL, while the folds
    # init from 0.0 → 0.0, and mean_v's /size(=0) CRASHES under ANSI.
    # CASE branches evaluate lazily, so the division never runs empty.
    nonempty = F.size("embedding") > 0
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("n_dims"),
        quantize(F.when(nonempty, F.sqrt(sq_sum)), "l2_norm", 4),
        quantize(F.when(nonempty, F.array_max(abs_arr)), "max_abs", 4),
        quantize(F.when(nonempty, total / F.size("embedding")), "mean_v", 4),
    )


@query(
    "modal_value_bucket",
    """
    SELECT event_type, bucket AS modal_bucket, n AS modal_count
    FROM (
      SELECT event_type, bucket, n,
             row_number() OVER (PARTITION BY event_type ORDER BY n DESC, bucket) AS rn
      FROM (
        SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2
      )
    ) WHERE rn = 1
    """,
)
def modal_value_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the most frequent value bucket per event
    type. Built-in ``mode()`` is tie-arbitrary in every engine, so the
    engine's canonical form is count + rank with a full tie-break —
    same output everywhere, and the two-level aggregate is the scalable
    shape (first shuffle reduces to (type, bucket) cardinality, the
    ranking window sees only aggregated rows).
    """
    ev = load_table(spark, "events", sf_dir)
    # NaN gate on BOTH engines (review r6, 10th pass): NaN is NOT NULL,
    # so it passes the null filter; Spark's floor(NaN).cast silently
    # buckets it as 0 while DuckDB's CAST(floor(nan) AS BIGINT) ERRORS —
    # a silent-wrong vs hard-crash split the filter removes
    counts = (
        ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("event_type", F.floor(F.col("value") / 10).cast("bigint").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("bucket"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("bucket").alias("modal_bucket"), F.col("n").alias("modal_count"))
    )


@query(
    "distinct_users_hll_sketch",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users,
           TRUE AS sketch_within_5pct
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', count(DISTINCT user_id), TRUE FROM events
    """,
)
def distinct_users_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch surface (Datasketches-compatible
    ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
    Spark 3.5+): per-type user sketches PLUS their union re-estimated —
    the partial-aggregation contract a 100 TB rollup tree relies on
    (sketches combine associatively map-side and across grains; the
    union row proves MERGE, not just re-count).

    Sketch binaries/estimates are engine-specific, so the
    driver-checked output is the EXACT distinct count per group (and
    overall) plus ``sketch_within_5pct``: TRUE iff each sketch
    estimate — including the merged union's — is within 5% of the
    exact value. A merge or estimate regression flips the boolean and
    fails the driver's value-hash."""
    ev = load_table(spark, "events", sf_dir)
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_users"),
    )
    tol_ok = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= exact * F.lit(0.05)
    )
    per_type_row = per_type.select(
        "event_type",
        "n_users",
        tol_ok(F.hll_sketch_estimate("sk"), F.col("n_users")).alias(
            "sketch_within_5pct"
        ),
    )
    overall_exact = ev.agg(F.count_distinct("user_id").alias("n_users"))
    # empty-input guard (review r6, 10th pass): a union over ZERO
    # per-type sketches is NULL, whose estimate is NULL and whose
    # tolerance check is NULL — the oracle's 'ALL' row says TRUE with
    # n_users 0. An absent sketch estimates 0 distinct, which is within
    # any tolerance of the exact 0.
    overall = (
        per_type.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(overall_exact)
        .select(
            F.lit("ALL").alias("event_type"),
            "n_users",
            tol_ok(
                F.coalesce(F.hll_sketch_estimate("sk"), F.lit(0).cast("long")),
                F.col("n_users"),
            ).alias("sketch_within_5pct"),
        )
    )
    return per_type_row.unionByName(overall)


@query(
    "ewma_user_value",
    """
    WITH RECURSIVE ordered AS (
        SELECT user_id, event_id, ts, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE value IS NOT NULL
    ), rec(user_id, event_id, rn, ts, ewma) AS (
        SELECT user_id, event_id, rn, ts, value FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_id, o.rn, o.ts, 0.3 * o.value + 0.7 * r.ewma
        FROM rec r JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT user_id, event_id, ts, floor(ewma * 10000 + 0.5) / 10000.0 AS ewma
    FROM rec
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (α = 0.3) — the engine's
    ``applyInPandas`` recurrence operator (operators/recurrence.py)
    verified row-for-row against a recursive-CTE oracle computing the
    identical recursion. This is the pattern for any per-key sequential
    state in BATCH (streaming twin: applyInPandasWithState in
    streaming/stateful.py).

    Scale: one shuffle on user_id; Arrow batches per key; no global
    ordering anywhere.
    """
    from .operators import recurrence

    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    out = recurrence.ewma_per_key(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=0.3,
    )
    return out.select(
        "user_id", "event_id", "ts", quantize(F.col("ewma"), "ewma", 4)
    )


@query(
    "funnel_conversion",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY 1
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): users whose FIRST
    qualifying event at each stage happens strictly after the previous
    stage's — the product-analytics staple. Expressed as a cascade of
    per-user min aggregates, each joined to the previous stage's
    anchor: three shuffles on user_id (co-partitioned after the first)
    + three broadcast scalar counts. No windows over the full event
    stream, no per-user sorting — state per stage is one timestamp per
    surviving user. Each stage anchor is MATERIALIZED (one timestamp
    per surviving user — bounded): each feeds both the next stage and
    its own count, and unmaterialized the cascade re-derived every
    predecessor per consumer (measured: 11 event scans; now 3, one
    pushed-filter scan per stage)."""
    from .checkpointing import truncate_lineage

    ev = load_table(spark, "events", sf_dir)
    v = truncate_lineage(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view")),
        None,
    )
    c = truncate_lineage(
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click")),
        None,
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@query(
    "cohort_retention",
    """
    WITH first_seen AS (
        SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1
    )
    SELECT date_trunc('week', f.t0) AS cohort_week,
           CAST(floor(date_diff('day', date_trunc('week', f.t0),
                                date_trunc('week', e.ts)) / 7) AS BIGINT)
             AS week_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by the week they
    first appeared; n_active = distinct users of that cohort active at
    each week offset — the second product-analytics staple. One
    per-user min aggregate, one join back to events (both shuffles on
    user_id), one distinct-count aggregate on (cohort, offset); at
    100 TB the distinct expansion is the heavy stage and the declared
    scale path is approx_count_distinct, same trade as
    distinct_users_approx. The per-user first-seen table is
    materialized (|users| rows) so the events scan happens once per
    side, not once per consumer."""
    from .checkpointing import truncate_lineage

    ev = load_table(spark, "events", sf_dir)
    first_seen = truncate_lineage(
        ev.groupBy("user_id").agg(F.min("ts").alias("t0")), None
    )
    joined = ev.join(first_seen, "user_id").select(
        "user_id",
        # to_date: Spark's date_trunc yields TIMESTAMP, DuckDB's DATE —
        # surface the DATE form on both sides
        F.to_date(F.date_trunc("week", "t0")).alias("cohort_week"),
        (
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.date_trunc("week", "t0"))
                / 7
            )
        ).alias("week_offset"),
    )
    return joined.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").alias("n_active")
    )


@query(
    "daily_revenue_anomalies",
    """
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100.0 AS rev
      FROM lineitem GROUP BY 1
    ), scored AS (
      SELECT d, rev,
             avg(rev) OVER w AS mu,
             stddev_samp(rev) OVER w AS sd,
             count(*) OVER w AS n_win
      FROM daily
      WINDOW w AS (
        ORDER BY date_diff('day', DATE '1970-01-01', d)
        RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING
      )
    )
    SELECT d, rev,
           floor(((rev - mu) / sd) * 10000 + 0.5) / 10000.0 AS z,
           abs(rev - mu) > 3 * sd AS is_anomaly
    FROM scored
    WHERE n_win >= 7 AND sd > 0
    """,
)
def daily_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly flags: each day's revenue z-scored against
    its own TRAILING 28-day window (RANGE frame ending at 1 PRECEDING —
    the current day never contaminates its own baseline; calendar gaps
    shrink the window instead of silently spanning it). Days with fewer
    than 7 trailing observations or a degenerate baseline are withheld
    rather than scored against noise.

    Scale: same shape as moving_avg_7d — the unpartitioned window runs
    over the PRE-AGGREGATED daily series (calendar-bounded cardinality),
    after the one heavy map-side-combined reduction. Per-entity
    monitoring partitions the window by the entity key and scales
    linearly."""
    li = load_table(spark, "lineitem", sf_dir)
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        quantize(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "rev", 2
        )
    )
    day_nr = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(day_nr).rangeBetween(-28, -1)
    scored = daily.select(
        "d",
        "rev",
        F.avg("rev").over(w).alias("mu"),
        F.stddev_samp("rev").over(w).alias("sd"),
        F.count("*").over(w).alias("n_win"),
    )
    return (
        scored.filter((F.col("n_win") >= 7) & (F.col("sd") > 0))
        .select(
            "d",
            "rev",
            quantize((F.col("rev") - F.col("mu")) / F.col("sd"), "z", 4),
            (F.abs(F.col("rev") - F.col("mu")) > 3 * F.col("sd")).alias("is_anomaly"),
        )
    )


@query(
    "part_cooccurrence",
    """
    WITH pl AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM pl a JOIN pl b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in ≥2
    orders — the candidate-generation stage of association mining (the
    support-2 cut IS the a-priori pruning step). Self-join on the order
    key after a DISTINCT projection, pair direction fixed by part-key
    order.

    Scale: the self-join shuffles on l_orderkey, and fan-out per order
    is lines²-bounded (TPC-H ≤ 7 lines → ≤ 21 pairs/order — linear in
    practice). The pair aggregate is a plain map-side-combined hash agg
    whose key space is the observed co-occurrence structure, far
    smaller than |parts|². A pathological basket (one order with 10⁵
    items) is the skew lever: cap basket size upstream, same policy as
    LSH's max_bucket."""
    li = load_table(spark, "lineitem", sf_dir)
    pl = li.select("l_orderkey", "l_partkey").distinct()
    a = pl.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = pl.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    pairs = a.join(b, "k").filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@query(
    "rfm_segments",
    """
    WITH anchor AS (SELECT max(o_orderdate) AS t1 FROM orders),
    per_cust AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), (SELECT t1 FROM anchor)) AS recency_days,
             count(*) AS frequency,
             floor(sum(o_totalprice) * 100 + 0.5) / 100.0 AS monetary
      FROM orders GROUP BY 1
    )
    SELECT o_custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS INT) AS r_bucket,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_bucket,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_bucket
    FROM per_cust
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order,
    anchored at the dataset's max date for determinism) / frequency /
    monetary, each quintile-bucketed with key tie-breaks so the
    buckets are engine-identical.

    Scale: per-customer aggregate first (one map-side-combined
    shuffle); the three quintile cuts then run over |customers|
    pre-reduced rows via `ranks.exact_ntile` — quantile-bucketed,
    bucket-partitioned windows, EXACT quintile boundaries, no
    single-task stage even at extreme customer counts (r8, replacing
    the unpartitioned ntile windows the r7 verdict flagged). The
    per-customer frame is materialized so the three cuts read it
    once."""
    from .checkpointing import truncate_lineage
    from .operators import ranks

    orders = load_table(spark, "orders", sf_dir)
    anchor = orders.agg(F.max("o_orderdate").alias("t1"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            quantize(F.sum("o_totalprice"), "monetary", 2),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.to_date("t1"), F.to_date("last_order"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    per_cust = truncate_lineage(per_cust, None)
    # lineage cut between the chained cuts: each exact_ntile runs an
    # eager approxQuantile action, which would otherwise re-execute
    # every PRIOR cut's window+join (review r8 — ~3× redundant work)
    cut = truncate_lineage(
        ranks.exact_ntile(
            per_cust,
            [("recency_days", "asc"), ("o_custkey", "asc")],
            5,
            out="r_bucket",
        ),
        None,
    )
    cut = truncate_lineage(
        ranks.exact_ntile(
            cut,
            [("frequency", "desc"), ("o_custkey", "asc")],
            5,
            out="f_bucket",
        ),
        None,
    )
    cut = ranks.exact_ntile(
        cut,
        [("monetary", "desc"), ("o_custkey", "asc")],
        5,
        out="m_bucket",
    )
    return cut.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_bucket",
        "f_bucket",
        "m_bucket",
    )


@query(
    "revenue_concentration",
    """
    WITH per_cust AS (
      SELECT o_custkey, floor(sum(o_totalprice) * 100 + 0.5) / 100.0 AS total
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT total,
             CAST(ntile(10) OVER (ORDER BY total DESC, o_custkey) AS INT) AS decile
      FROM per_cust
    ), grand AS (SELECT sum(total) AS g FROM per_cust)
    SELECT decile,
           count(*) AS n_customers,
           floor((sum(total) / (SELECT g FROM grand)) * 1000000 + 0.5) / 1000000.0
             AS revenue_share
    FROM ranked GROUP BY decile
    """,
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / Lorenz view: customers split into spend deciles
    (top decile = 1), each decile's share of total revenue — the
    "top 10% of customers drive X% of revenue" concentration check.
    Same scale shape as rfm_segments: one per-customer reduction, then
    `ranks.exact_ntile` over the pre-reduced rows — exact deciles, no
    single-task global window (r8)."""
    from .operators import ranks

    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        quantize(F.sum("o_totalprice"), "total", 2)
    )
    ranked = ranks.exact_ntile(
        per_cust,
        [("total", "desc"), ("o_custkey", "asc")],
        10,
        out="decile",
    ).select("total", "decile")
    grand = per_cust.agg(F.sum("total").alias("g"))
    return (
        ranked.groupBy("decile")
        .agg(F.count("*").alias("n_customers"), F.sum("total").alias("dec_total"))
        .crossJoin(F.broadcast(grand))
        .select(
            "decile",
            "n_customers",
            quantize(F.col("dec_total") / F.col("g"), "revenue_share", 6),
        )
    )


@query(
    "user_value_runs",
    """
    WITH buck AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value / 100.0) AS BIGINT) AS vb
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ), flagged AS (
      SELECT user_id, ts, event_id, vb,
             CASE WHEN vb = lag(vb) OVER w THEN 0 ELSE 1 END AS is_start
      FROM buck WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, ts, vb,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, vb AS value_bucket,
           min(ts) AS valid_from, max(ts) AS last_seen, count(*) AS n_events
    FROM runs GROUP BY 1, 2, 3
    """,
)
def user_value_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands / SCD2-style run compression: consecutive
    events with the same value bucket per user collapse into one
    validity row (run id = running count of change points). The
    history-table build every CDC pipeline performs, expressed with
    lag + running sum — both over ONE window spec, so the whole query
    is a single shuffle on user_id plus the final run aggregate.

    Scale: state per partition is one previous-row buffer (streaming
    frame, no buffering of whole partitions); run count is bounded by
    events, aggregate key by runs. Value bucketing (floor/100) keeps
    runs non-trivial on continuous data — real CDC compares natural
    attribute values."""
    # NaN gate on both engines — same split as modal_value_bucket
    # (silent bucket-0 on Spark vs cast error on DuckDB; review r6)
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    buck = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 100.0).cast("bigint").alias("vb"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = buck.withColumn(
        "is_start",
        F.when(F.col("vb") == F.lag("vb").over(w), F.lit(0)).otherwise(F.lit(1)),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return runs.groupBy(
        "user_id",
        F.col("run_id").cast("bigint").alias("run_id"),
        F.col("vb").alias("value_bucket"),
    ).agg(
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("last_seen"),
        F.count("*").alias("n_events"),
    )


@query(
    "event_path_trigrams",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS e1, e2, e3, count(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    HAVING count(*) >= 5
    """,
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the most common 3-step event-type
    sequences per user stream (lead ×2 over one window spec → one
    shuffle on user_id), support-5 cut. The "what do users do next"
    flow analysis, and the n-gram trick from text applied to event
    streams."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "profile_events",
    """
    WITH s AS (SELECT * FROM events)
    SELECT * FROM (
      SELECT 'event_id' AS "column", 'bigint' AS dtype, count(*) AS n_rows,
             CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             count(DISTINCT event_id) AS n_distinct,
             min(event_id)::VARCHAR AS min_value, max(event_id)::VARCHAR AS max_value
      FROM s
      UNION ALL
      SELECT 'event_type', 'string', count(*),
             CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT event_type),
             min(event_type), max(event_type) FROM s
      UNION ALL
      SELECT 'props', 'string', count(*),
             CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT props),
             min(props), max(props) FROM s
      UNION ALL
      SELECT 'ts', 'timestamp', count(*),
             CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT ts),
             min(ts)::VARCHAR, max(ts)::VARCHAR FROM s
      UNION ALL
      SELECT 'user_id', 'bigint', count(*),
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT user_id),
             min(user_id)::VARCHAR, max(user_id)::VARCHAR FROM s
    ) ORDER BY "column"
    """,
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (operators/profile.py): one aggregate pass
    computes every column's row/null/distinct counts and stringified
    min/max side by side, then unpivots the single result row long-form
    — never one job per column. The ``value`` double column is omitted
    from THIS driver-checked profile only because engines format
    double→string differently; the operator itself profiles any column.
    """
    from .operators import profile as prof

    ev = load_table(spark, "events", sf_dir)
    return prof.profile(ev, ["event_id", "ts", "user_id", "event_type", "props"])


@query(
    "exact_value_percentiles",
    """
    WITH s AS (SELECT value FROM events WHERE value IS NOT NULL)
    SELECT p, floor(pv * 100 + 0.5) / 100.0 AS pct_value
    FROM (
      SELECT CAST(0.5 AS DOUBLE) AS p, quantile_disc(value, 0.5) AS pv
      FROM s
      UNION ALL SELECT CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9)
      FROM s
      UNION ALL SELECT CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99)
      FROM s
    ) ORDER BY p
    """,
)
def exact_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles (p50/p90/p99) with NO global sort —
    the flagship use of operators/ranks.py beyond ntile: collapse to
    the DISTINCT-VALUE relation (one map-side-combined hash agg), take
    an inclusive prefix sum of the tie counts (bucket-partitioned
    windows + triangle offset join), and each percentile is the
    smallest value whose cumulative count reaches ceil(p·N) — the
    PERCENTILE_DISC definition, and provably the same element DuckDB's
    quantile_disc picks (for 0<p<1, ceil(p·N) = floor(p·(N−1))+1).
    The ε guard keeps an IEEE-754 p·N that lands a hair ABOVE an
    integer from ceiling one position too far.

    This is what replaces both the sort-based exact percentile (one
    task at 100 TB) and the approx_percentile fallback when the answer
    must be exact: cost = one hash agg + prefix-sum machinery over
    |distinct values|, all parallel. The same relation answers any
    number of percentiles (three here) in one pass."""
    from .operators import ranks

    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select(F.col("value").alias("v"))
    )
    grp = ev.groupBy("v").agg(F.count("*").alias("cnt"))
    cum = ranks.with_prefix_sum(
        grp, [("v", "asc")], "cnt", out="cum", inclusive=True
    )
    tot = grp.agg(F.sum("cnt").alias("n"))
    ps = local_frame(spark, [(0.5,), (0.9,), (0.99,)], "p double")
    target = F.ceil(F.col("p") * F.col("n") - F.lit(1e-9))
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ps))
        .filter(F.col("cum") >= target)
        .groupBy("p")
        .agg(quantize(F.min("v"), "pct_value"))
        .orderBy("p")
    )
