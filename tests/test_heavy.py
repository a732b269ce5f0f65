"""Misra-Gries two-pass exact top-k (operators/heavy.py): the recount
must equal the plain groupBy answer whenever the certificate holds,
the certificate must refuse honestly when the cap is undersized, and
the pass-1 stream must never shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mastery_pipeline_spark.functions import text as textfn
from data_mastery_pipeline_spark.operators import heavy
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_ORACLE


def _tokens(spark):
    docs = load_table(spark, "documents", SF_ORACLE)
    return docs.select(F.explode(textfn.tokens("text")).alias("tok"))


def test_exact_topk_matches_groupby(spark):
    toks = _tokens(spark)
    got = heavy.exact_topk(toks, "tok", k=20, cap=1024).collect()
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.col("tok"))
        .limit(20)
        .collect()
    )
    assert [(r["tok"], r["n"]) for r in got] == [
        (r["tok"], r["n"]) for r in exact
    ]
    assert all(r["guarantee_ok"] for r in got)


def test_undersized_cap_flags_not_lies(spark):
    """cap=1 cannot certify a top-20 over a real vocabulary: the
    certificate must come back FALSE (the k-th recount cannot exceed
    N/2). The list may then be wrong — the flag is the contract."""
    toks = _tokens(spark)
    got = heavy.exact_topk(toks, "tok", k=20, cap=1).collect()
    assert got, "candidates should still surface"
    assert not any(r["guarantee_ok"] for r in got)


def test_superset_guarantee_on_skewed_synthetic(spark):
    """Construct a stream where one key holds > N/(cap+1): it MUST be
    in the candidates of mg_summarize regardless of partitioning."""
    rows = (
        [("hot",)] * 400
        + [(f"cold{i}",) for i in range(300)]
        + [(f"cool{i % 50}",) for i in range(300)]
    )
    df = spark.createDataFrame(rows, "tok string").repartition(7)
    cands = {
        r["tok"]
        for r in heavy.mg_summarize(df, "tok", cap=8)
        .filter(F.col("tok").isNotNull())
        .collect()
    }
    assert "hot" in cands
    out = heavy.exact_topk(df, "tok", k=1, cap=8).collect()
    assert out[0]["tok"] == "hot" and out[0]["n"] == 400
    assert out[0]["guarantee_ok"]  # 400 * 9 > 1000


def test_pass1_is_map_only(spark):
    """The MG summary plan must contain no key shuffle — pass 1 never
    hash-partitions the stream (load_table's RoundRobin fan-out of the
    single source file is allowed; it is a spread, not a groupBy)."""
    toks = _tokens(spark)
    plan = (
        heavy.mg_summarize(toks, "tok", cap=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" not in plan, plan
    assert "MapInPandas" in plan


def test_empty_input(spark):
    df = spark.createDataFrame([], "tok string")
    assert heavy.exact_topk(df, "tok", k=5, cap=16).collect() == []
