"""Skew-mitigation operators: salting must be semantically invisible
and must actually spread hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mastery_pipeline_spark.operators import skew
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_ORACLE


def test_salted_aggregate_matches_plain(spark):
    ev = load_table(spark, "events", SF_ORACLE).select("event_type", "value")
    salted = skew.salted_aggregate(
        ev, ["event_type"],
        [("sum", "value", "s"), ("avg", "value", "a"),
         ("min", "value", "lo"), ("max", "value", "hi"),
         ("count", "value", "n")],
    )
    plain = ev.groupBy("event_type").agg(
        F.sum("value").alias("s"), F.avg("value").alias("a"),
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.count("value").alias("n"),
    )
    s = {r["event_type"]: r for r in salted.collect()}
    p = {r["event_type"]: r for r in plain.collect()}
    assert s.keys() == p.keys()
    for k in p:
        assert abs(s[k]["s"] - p[k]["s"]) < 1e-6 * max(1.0, abs(p[k]["s"]))
        assert abs(s[k]["a"] - p[k]["a"]) < 1e-9 * max(1.0, abs(p[k]["a"]))
        assert (s[k]["lo"], s[k]["hi"], s[k]["n"]) == (p[k]["lo"], p[k]["hi"], p[k]["n"])


def test_salted_join_matches_plain(spark):
    ev = load_table(spark, "events", SF_ORACLE).select("event_id", "user_id", "value")
    users = (
        ev.groupBy("user_id").agg(F.avg("value").alias("u_avg"))
    )
    plain = ev.join(users, on=["user_id"], how="inner")
    salted = skew.salted_join(ev, users, on=["user_id"], salt_buckets=8)
    assert salted.count() == plain.count()
    a = sorted(tuple(r) for r in salted.select("event_id", "u_avg").collect())
    b = sorted(tuple(r) for r in plain.select("event_id", "u_avg").collect())
    assert a == b


def test_salt_actually_spreads_hot_key(spark):
    # one key for every row — unsalted groupBy puts it all on one task;
    # the salted partial stage must produce multiple buckets. Uses the
    # OPERATOR'S OWN salt (skew.content_salt — the expression
    # salted_aggregate sprays with), not an inline copy: a regression
    # to e.g. lit(0) inside the operator is invisible to the semantic
    # equality tests (salt never affects results) and must fail HERE
    # (review r6).
    ev = load_table(spark, "events", SF_ORACLE).withColumn("k", F.lit("hot"))
    salt = skew.content_salt(ev, 32)
    n_buckets = ev.withColumn("__salt", salt).select("__salt").distinct().count()
    assert n_buckets == 32


def test_salted_count_star_includes_nulls(spark):
    """Review r6: ("count", "*") must count ROWS (COUNT(*) semantics) —
    count("value") skipped nulls and silently diverged from a count(*)
    oracle on any data with null measures."""
    rows = [("a", 1.0), ("a", None), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "k string, value double")
    out = skew.salted_aggregate(
        df, ["k"], [("count", "*", "n"), ("count", "value", "n_nonnull")]
    )
    got = {r["k"]: (r["n"], r["n_nonnull"]) for r in out.collect()}
    assert got == {"a": (2, 1), "b": (2, 0)}


def test_asof_join_tie_break_is_deterministic(spark):
    """Review r6: two quotes sharing (key, quote_ts) must resolve by a
    deterministic policy (greatest quote tuple), not partition arrival
    order — repo convention: deterministic keep-policies everywhere."""
    from data_mastery_pipeline_spark.operators import joins

    quotes = spark.createDataFrame(
        [(1, 100, 5.0), (1, 100, 9.0), (1, 100, 7.0)],
        "uid long, qts long, qval double",
    )
    fact = spark.createDataFrame([(1, 100), (1, 150)], "uid long, fts long")
    for attempt in range(3):  # repeated runs must agree
        out = joins.asof_join(
            fact.repartition(4 + attempt),  # vary physical layout too
            quotes.repartition(3 + attempt),
            key="uid",
            fact_ts="fts",
            quote_ts="qts",
            quote_cols=["qts", "qval"],
        )
        got = sorted((r["fts"], r["qval"]) for r in out.collect())
        assert got == [(100, 9.0), (150, 9.0)], got
