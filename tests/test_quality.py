"""Quality-gate tests (SURVEY §2.L Q1-Q5): the single-pass check harness
on real tables, pass and fail paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mastery_pipeline_spark.operators import quality
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_ORACLE


def test_clean_table_passes(spark):
    ev = load_table(spark, "events", SF_ORACLE)
    rep = quality.check_quality(
        ev,
        key_cols=["event_id"],
        null_checked=["user_id", "ts", "value"],
        range_checks=[("value", -1e6, 1e6)],
    )
    assert rep.passed, rep.failures
    assert rep.n_rows == ev.count()
    assert rep.n_duplicate_keys == 0
    assert all(pct == 0.0 for pct in rep.null_pct.values())


def test_null_threshold_fails(spark):
    ev = load_table(spark, "events", SF_ORACLE).withColumn(
        "maybe", F.when(F.col("value") < 300, None).otherwise(F.col("value"))
    )
    rep = quality.check_quality(
        ev, key_cols=[], null_checked=["maybe"], null_pct_max=0.10
    )
    assert not rep.passed
    assert any("null pct" in f for f in rep.failures)


def test_duplicate_keys_fail(spark):
    ev = load_table(spark, "events", SF_ORACLE)
    rep = quality.check_quality(
        ev, key_cols=["user_id"], null_checked=[]  # user_id repeats heavily
    )
    assert not rep.passed
    assert rep.n_duplicate_keys > 0


def test_range_violations_counted(spark):
    ev = load_table(spark, "events", SF_ORACLE)
    lo, hi = 0.0, 100.0
    rep = quality.check_quality(
        ev, key_cols=[], null_checked=[], range_checks=[("value", lo, hi)]
    )
    expected = ev.filter(~F.col("value").between(lo, hi)).count()
    assert rep.n_range_violations == expected
    assert (expected > 0) == (not rep.passed)


def test_empty_dataset_fails(spark):
    ev = load_table(spark, "events", SF_ORACLE).filter(F.lit(False))
    rep = quality.check_quality(ev, key_cols=[], null_checked=[])
    assert not rep.passed
    assert "empty dataset" in rep.failures


def test_observed_metrics_piggyback_on_the_action(spark):
    """observe() yields row/null counts from the SAME job as the real
    action — the scale-correct replacement for the reference's
    count()-per-stage pattern (silver_processor.py:148,198,326)."""
    from data_mastery_pipeline_spark.operators.quality import with_observed_metrics
    from data_mastery_pipeline_spark.tables import load_table
    from conftest import SF_ORACLE

    ev = load_table(spark, "events", SF_ORACLE).select("event_id", "user_id", "props")
    observed, obs = with_observed_metrics(ev, "ev_metrics", value_cols=["props"])
    # one real action (the pipeline's own write/agg); metrics ride along
    n_out = observed.filter(F.col("user_id").isNotNull()).count()
    got = obs.get
    assert got["n_rows"] == ev.count()  # observed BEFORE the filter
    assert got["null_props"] == ev.filter(F.col("props").isNull()).count()
    assert n_out <= got["n_rows"]


# --- round 2: repetition metrics, PII scrub -------------------------------


def test_repetition_metrics_known_values(spark):
    from data_mastery_pipeline_spark.functions import text as textfn

    df = spark.createDataFrame(
        [("a a a a",), ("x\nx\ny",), ("w1 w2 w3 w4",)], "text string"
    )
    m = textfn.repetition_metrics("text")
    rows = df.select(
        m["dup_token_frac"].alias("t"),
        m["dup_2gram_frac"].alias("g2"),
        m["dup_line_frac"].alias("ln"),
    ).collect()
    # "a a a a": 4 tokens 1 distinct → 0.75; 3 bigrams "a a" → 2/3
    assert rows[0]["t"] == 0.75 and abs(rows[0]["g2"] - 2 / 3) < 1e-12
    # "x\nx\ny": 3 lines, 2 distinct → 1/3
    assert abs(rows[1]["ln"] - 1 / 3) < 1e-12
    # all-unique doc: zero everywhere
    assert rows[2]["t"] == 0.0 and rows[2]["g2"] == 0.0 and rows[2]["ln"] == 0.0


def test_word_ngrams_short_doc_single_entry(spark):
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.functions import text as textfn

    df = spark.createDataFrame([("a b",)], "text string")
    got = df.select(textfn.word_ngrams("text", 8).alias("g")).collect()[0]["g"]
    assert got == ["a b"]  # whole short run once; can't equal a true 8-gram
    got3 = df.select(
        F.size(textfn.word_ngrams(F.lit("q w e r t"), 3)).alias("n")
    ).collect()[0]["n"]
    assert got3 == 3  # n-k+1 grams


def test_pii_scrub_and_counts(spark):
    from data_mastery_pipeline_spark.functions import text as textfn

    txt = (
        "write a@b.io or c.d+tag@ex-ample.org, host 10.0.255.7, "
        "call +49 151 1234 5678 now"
    )
    df = spark.createDataFrame([(txt,), ("no pii here",)], "text string")
    out = df.select(
        textfn.scrub_pii("text").alias("clean"),
        *[c.alias(k) for k, c in textfn.pii_counts("text").items()],
    ).collect()
    assert out[0]["clean"] == (
        "write <EMAIL> or <EMAIL>, host <IP>, call <PHONE> now"
    )
    assert (out[0]["n_email"], out[0]["n_ip"], out[0]["n_phone"]) == (2, 1, 1)
    assert out[1]["clean"] == "no pii here"
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (0, 0, 0)


def test_chunk_spans_overlap_and_tail(spark):
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.functions import text as textfn

    df = spark.createDataFrame(
        [("a b c d e f g h",), ("x",)], "text string"
    )
    got = df.select(textfn.chunk_spans("text", chunk_size=4, overlap=1).alias("c")).collect()
    chunks0 = [(r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"]) for r in got[0]["c"]]
    # starts step by 3: [a b c d], [d e f g], [g h] — overlap 1, short tail
    assert chunks0 == [(0, "a b c d", 4), (1, "d e f g", 4), (2, "g h", 2)]
    assert [tuple(r) for r in got[1]["c"]] == [(0, "x", 1)]
    import pytest as _pt

    with _pt.raises(ValueError, match="overlap"):
        df.select(textfn.chunk_spans("text", chunk_size=4, overlap=4))


def test_pack_greedy_concat_and_split_semantics(spark):
    from data_mastery_pipeline_spark.operators import packing

    df = spark.createDataFrame(
        [("a", 1, 6), ("a", 2, 3), ("a", 3, 4), ("a", 4, 10), ("b", 1, 9)],
        "src string, i long, n long",
    )
    out = packing.pack_greedy(
        df, size_col="n", order_col="i", partition_cols=["src"], capacity=8
    )
    got = {(r["src"], r["i"]): (r["start_offset"], r["bin_id"]) for r in out.collect()}
    # src a: offsets 0,6,9,13 → bins 0,0,1,1 (item 2 straddles 8, counted
    # at its start; item 4 starts in bin 1 and spills into bin 2)
    assert got[("a", 1)] == (0, 0)
    assert got[("a", 2)] == (6, 0)
    assert got[("a", 3)] == (9, 1)
    assert got[("a", 4)] == (13, 1)
    # src b packs independently from offset 0
    assert got[("b", 1)] == (0, 0)


def test_fd_audit_identities(spark):
    from data_mastery_pipeline_spark.operators.profile import fd_audit

    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "a"), (3, 20, "b"), (4, 20, "c")],
        "id long, grp long, tag string",
    )
    out = {
        r["check_name"]: (r["n_groups"], r["n_distinct"], r["holds"])
        for r in fd_audit(
            df,
            keys=[("id",), ("grp",)],
            fds=[(("id",), "grp"), (("grp",), "tag")],
        ).collect()
    }
    assert out["key:id"] == (4, 4, True)
    assert out["key:grp"] == (4, 2, False)
    assert out["fd:id->grp"] == (4, 4, True)
    # grp=20 maps to two tags -> violated, surplus of exactly 1 combo
    assert out["fd:grp->tag"] == (2, 3, False)


def test_fd_audit_is_one_scan(spark):
    """Every check folds into ONE aggregate over one scan — the stack()
    unpivot must not re-execute the source per check."""
    from data_mastery_pipeline_spark.operators.profile import fd_audit

    df = spark.range(100).selectExpr("id", "id % 7 AS g")
    plan = fd_audit(
        df, keys=[("id",)], fds=[(("id",), "g")]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_bucket_checksums_layout_invariant_and_sensitive(spark):
    from data_mastery_pipeline_spark.operators.quality import (
        bucket_checksums,
    )

    rows = [(i, f"s{i % 5}") for i in range(500)]
    a = spark.createDataFrame(rows, "id long, s string").repartition(13)
    b = spark.createDataFrame(list(reversed(rows)), "id long, s string").coalesce(1)
    ca = sorted(tuple(r) for r in bucket_checksums(a, ["id", "s"], 16).collect())
    cb = sorted(tuple(r) for r in bucket_checksums(b, ["id", "s"], 16).collect())
    assert ca == cb  # order- and layout-independent
    assert sum(r[1] for r in ca) == 500
    mutated = spark.createDataFrame(
        rows[:-1] + [(499, "MUTATED")], "id long, s string"
    )
    cm = sorted(
        tuple(r) for r in bucket_checksums(mutated, ["id", "s"], 16).collect()
    )
    assert cm != ca  # a single-row change flips at least one bucket


def test_bucket_checksums_null_position_disambiguated(spark):
    """concat_ws drops NULLs silently — the canonical text must render
    them explicitly or ('a', NULL, 'b') and ('a', 'b', NULL) hash
    identically (review r8)."""
    from data_mastery_pipeline_spark.operators.quality import (
        bucket_checksums,
    )

    a = spark.createDataFrame([("a", None, "b")], "x string, y string, z string")
    b = spark.createDataFrame([("a", "b", None)], "x string, y string, z string")
    ca = sorted(tuple(r) for r in bucket_checksums(a, ["x", "y", "z"], 4).collect())
    cb = sorted(tuple(r) for r in bucket_checksums(b, ["x", "y", "z"], 4).collect())
    assert ca != cb
