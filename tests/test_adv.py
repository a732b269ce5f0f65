"""Invariant + plan tests for the round-5 advanced queries.

Oracle parity (tests/test_oracle_parity.py) proves engine-vs-engine
value equality for every query here; these pin the mathematical
invariants and the physical-plan shapes that parity cannot see.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import data_mastery_pipeline_spark.queries_adv  # noqa: F401
from data_mastery_pipeline_spark.plans import inspect as plans
from data_mastery_pipeline_spark.registry import QUERIES

from conftest import SF_SMOKE

# ---------------------------------------------------------------------------
# CDC
# ---------------------------------------------------------------------------


def test_snapshot_diff_classes_partition_the_union(spark, duck):
    rows = {r["change_type"]: r for r in QUERIES["snapshot_diff"](spark, SF_SMOKE).collect()}
    # 'delete' (keys ≡ 0 mod 101 in the old window) can be legitimately
    # empty at the smallest SF — the other classes must exist
    assert {"insert", "update", "unchanged"} <= set(rows)
    assert set(rows) <= {"insert", "update", "delete", "unchanged"}
    # the four classes partition old ∪ new: |old| + inserts = total keys
    n_total = sum(r["n"] for r in rows.values())
    n_old = duck.sql(
        "SELECT count(*) FROM read_parquet('{}/orders.parquet') "
        "WHERE o_orderdate < TIMESTAMP '2000-01-01' AND o_orderkey % 101 <> 0".format(SF_SMOKE)
    ).fetchone()[0]
    assert n_total == n_old + rows["insert"]["n"]
    # deletes carry no new-side price; inserts no old-side price
    if "delete" in rows:
        assert rows["delete"]["sum_new_price"] == 0.0
    assert rows["insert"]["sum_old_price"] == 0.0
    # every update restated the price upward (×1.1)
    assert rows["update"]["sum_new_price"] > rows["update"]["sum_old_price"]


def test_incremental_merge_equals_full_recompute(spark):
    """The defining property: base ⊕ delta == full recompute (the oracle
    checks vs DuckDB; this checks vs a direct one-pass Spark recompute,
    so an error symmetric across engines still gets caught)."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.tables import load_table

    inc = {
        (str(r["day"]), r["event_type"]): (r["n_events"], r["sum_value"], r["min_value"], r["max_value"])
        for r in QUERIES["incremental_daily_agg"](spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, "events", SF_SMOKE)
    full = {
        (str(r["day"]), r["event_type"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in ev.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert set(inc) == set(full)
    for k, (n, s, mn, mx) in inc.items():
        fn, fs, fmn, fmx = full[k]
        assert n == fn, k
        assert math.isclose(s, fs, abs_tol=0.02), k
        assert math.isclose(mn, fmn, abs_tol=0.001), k
        assert math.isclose(mx, fmx, abs_tol=0.001), k


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def test_kmeans_partitions_all_vectors_and_no_collect(spark, duck):
    rows = QUERIES["kmeans_embeddings"](spark, SF_SMOKE).collect()
    n_vecs = duck.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_vecs  # every vector assigned once
    assert all(0 <= r["cluster_id"] < 4 for r in rows)
    assert all(r["inertia"] >= 0.0 for r in rows)


def test_kmeans_iteration_does_not_increase_inertia(spark):
    """Lloyd's guarantee: total inertia after (assign→update→assign)
    ≤ inertia of the seed assignment."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.queries_adv import _KMEANS_K
    from data_mastery_pipeline_spark.tables import load_table

    emb = load_table(spark, "embeddings", SF_SMOKE).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    c0 = emb.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )
    dist = F.aggregate(
        F.zip_with("vec", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    seed_inertia = (
        emb.crossJoin(F.broadcast(c0))
        .select("vec_id", dist.alias("d"))
        .groupBy("vec_id")
        .agg(F.min("d").alias("best_d"))
        .agg(F.sum("best_d"))
        .collect()[0][0]
    )
    final_inertia = sum(
        r["inertia"] for r in QUERIES["kmeans_embeddings"](spark, SF_SMOKE).collect()
    )
    assert final_inertia <= seed_inertia + 0.01


def test_kmeans_centroids_broadcast_no_shuffled_cross(spark):
    df = QUERIES["kmeans_embeddings"](spark, SF_SMOKE)
    # both assignment joins run as broadcast nested loops against K rows
    assert plans.cartesian_product_count(df) == 0
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# Decision-support shapes
# ---------------------------------------------------------------------------


def test_small_quantity_revenue_broadcasts_part_and_avg(spark):
    df = QUERIES["small_quantity_revenue"](spark, SF_SMOKE)
    assert plans.broadcast_join_count(df) >= 2  # part dim + per-part avg
    assert plans.cartesian_product_count(df) == 0
    # brand filter reaches the part scan
    assert any("p_brand" in f for f in plans.pushed_filters(df))


def test_min_cost_supplier_argmin_no_window_rescans(spark):
    df = QUERIES["min_cost_supplier"](spark, SF_SMOKE)
    rows = df.collect()
    assert 0 < len(rows) <= 100
    # min(struct) argmin: no per-part window over the full unit relation
    plan = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert plans.broadcast_join_count(df) >= 3  # part, supplier, nation


def test_sole_blame_rows_are_late_only_blamers(spark, duck):
    rows = QUERIES["sole_blame_suppliers"](spark, SF_SMOKE).collect()
    assert rows, "testdata should contain sole-blame suppliers"
    assert all(r["numwait"] >= 1 for r in rows)
    # descending by numwait with name tiebreak, capped at 20
    waits = [(-r["numwait"], r["s_name"]) for r in rows]
    assert waits == sorted(waits)
    assert len(rows) <= 20


# ---------------------------------------------------------------------------
# Series / set analytics
# ---------------------------------------------------------------------------


def test_autocorr_bounded_and_preaggregated(spark):
    row = QUERIES["autocorr_daily_revenue"](spark, SF_SMOKE).collect()[0]
    assert -1.0 <= row["autocorr_lag1"] <= 1.0
    assert -1.0 <= row["autocorr_lag7"] <= 1.0
    assert row["n_days"] > 100
    # the single-partition window must run over the aggregated day series,
    # not the raw orders: exchanges = day-agg shuffle + the 1-partition
    # window + final scalar agg — a handful, not data-sized stages
    df = QUERIES["autocorr_daily_revenue"](spark, SF_SMOKE)
    assert plans.exchange_count(df) <= 4


def test_audience_overlap_jaccard_bounds(spark):
    rows = QUERIES["audience_overlap"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]  # unordered pairs, canonical order
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["common_users"] >= 1


def test_winsorized_std_never_exceeds_raw_std(spark):
    import data_mastery_pipeline_spark.queries  # noqa: F401

    win = {r["event_type"]: r for r in QUERIES["winsorized_value_stats"](spark, SF_SMOKE).collect()}
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.tables import load_table

    raw = {
        r["event_type"]: r["sd"]
        for r in load_table(spark, "events", SF_SMOKE)
        .groupBy("event_type")
        .agg(F.stddev_samp("value").alias("sd"))
        .collect()
    }
    for et, r in win.items():
        assert r["win_std"] <= raw[et] + 1e-6, et  # clipping shrinks spread


def test_reservoir_draws_exactly_k_per_source(spark):
    """EXACTLY k where the source has ≥ k docs (review r6, 9th pass:
    '<= 10' alone passed an under-sampling regression — the 'exactly k'
    in this test's name was untested)."""
    from data_mastery_pipeline_spark.tables import load_table

    per_source = {
        r["source"]: r["n"]
        for r in load_table(spark, "documents", SF_SMOKE)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = QUERIES["reservoir_per_source"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        want = min(10, per_source[r["source"]])
        assert r["n_sampled"] == want, (r, want)
        assert r["sampled_chars"] > 0


# ---------------------------------------------------------------------------
# Stream-static join
# ---------------------------------------------------------------------------


def test_stream_enrich_static_matches_batch_join(spark):
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.tables import load_table

    got = {
        r["c_mktsegment"]: (r["n_events"], r["sum_value"])
        for r in QUERIES["stream_enrich_static"](spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, "events", SF_SMOKE)
    cust = load_table(spark, "customer", SF_SMOKE)
    want = {
        r["c_mktsegment"]: (r["n"], r["s"])
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for k, (n, s) in got.items():
        assert n == want[k][0]
        assert math.isclose(s, want[k][1], abs_tol=0.02)


# ---------------------------------------------------------------------------
# Drift monitors
# ---------------------------------------------------------------------------


def test_psi_zero_for_identical_windows_property(spark):
    """PSI of two identical distributions is ~0, and a genuinely shifted
    window scores clearly positive — both through the PRODUCTION
    psi_between (review r6: the old test inlined (p−p)·ln(p/p), which
    is zero by algebra for any implementation and exercised nothing)."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.queries_adv import psi_between
    from data_mastery_pipeline_spark.tables import load_table

    ev = load_table(spark, "events", SF_SMOKE)
    ref = ev.filter(F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    for r in psi_between(ref, ref).collect():
        assert abs(r["psi"]) < 1e-9, r
    shifted = ref.withColumn("value", F.col("value") * 3 + 100.0)
    drifted = {r["event_type"]: r["psi"] for r in psi_between(ref, shifted).collect()}
    assert drifted and all(v > 0.25 for v in drifted.values()), drifted


def test_psi_real_windows_small_on_stationary_data(spark):
    rows = QUERIES["psi_value_drift"](spark, SF_SMOKE).collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        # PSI ≥ 0 up to one quantization quantum, and finite/sane. At
        # sf0.001 per-type samples are small enough that sampling noise
        # alone reaches ~0.35, so the bound is a sanity ceiling, not the
        # 0.25 production gate (at sf0.01 all five types sit < 0.04).
        assert -1e-5 <= r["psi"] < 1.0, r


def test_entropy_bands_bounded_by_log_type_count(spark, duck):
    import math as m

    rows = QUERIES["user_behavior_entropy"](spark, SF_SMOKE).collect()
    n_types = duck.sql(
        f"SELECT count(DISTINCT event_type) FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()[0]
    hmax = m.log(n_types)
    total_users = sum(r["n_users"] for r in rows)
    n_users = duck.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()[0]
    assert total_users == n_users  # every user lands in exactly one band
    for r in rows:
        assert 0.0 <= r["entropy_band"] <= hmax + 1e-9
        assert 0.0 <= r["avg_entropy"] <= hmax + 1e-4


# ---------------------------------------------------------------------------
# Sketch algebra + temperature resampling
# ---------------------------------------------------------------------------


def test_theta_overlap_certificate_all_true(spark):
    rows = QUERIES["theta_audience_overlap"](spark, SF_SMOKE).collect()
    assert rows
    # user cardinalities sit far under the sketch's exact-mode capacity
    # (lgK=12 → 4096 retained hashes): every estimate must certify
    assert all(r["sketch_within_5pct"] for r in rows)


def test_theta_overlap_agrees_with_exact_self_join(spark):
    """Both overlap queries' common_users against an INDEPENDENT
    formulation (per-user type sets → pair explode), not against each
    other: since the r6 _exact_common_users refactor both queries share
    one helper, so exact-vs-theta equality alone can no longer catch a
    counting bug — it would appear identically on both sides (review
    r6, 9th pass)."""
    from itertools import combinations

    from data_mastery_pipeline_spark.tables import load_table

    exact = {
        (r["type_a"], r["type_b"]): r["common_users"]
        for r in QUERIES["audience_overlap"](spark, SF_SMOKE).collect()
    }
    theta = {
        (r["type_a"], r["type_b"]): r["common_users"]
        for r in QUERIES["theta_audience_overlap"](spark, SF_SMOKE).collect()
    }
    assert exact == theta  # both carry the exact count column

    # independent recount: per-user sorted type set, all C(n,2) pairs
    ev = load_table(spark, "events", SF_SMOKE)
    per_user = (
        ev.select("user_id", "event_type").distinct()
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
        .collect()
    )
    want: dict = {}
    for r in per_user:
        for a, b in combinations(r["types"], 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert exact == want


def test_temperature_resample_rates_and_counts(spark):
    rows = QUERIES["temperature_resample"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["rate"] <= 1.0 + 1e-9, r
        assert 0 <= r["n_kept"] <= r["n_total"], r
        # kept fraction tracks the rate (gate is uniform over doc_id;
        # loose bound — strata are small at the smoke SF)
        if r["n_total"] >= 20:
            assert abs(r["n_kept"] / r["n_total"] - r["rate"]) < 0.35, r
    # the minimum-token source keeps everything (rate exactly 1)
    assert any(abs(r["rate"] - 1.0) < 1e-6 and r["n_kept"] == r["n_total"] for r in rows)


def test_temperature_resample_is_deterministic(spark):
    a = sorted(map(tuple, QUERIES["temperature_resample"](spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, QUERIES["temperature_resample"](spark, SF_SMOKE).collect()))
    assert a == b


def test_kll_certificates_and_merge_row(spark):
    rows = {r["event_type"]: r for r in QUERIES["kll_value_quantiles"](spark, SF_SMOKE).collect()}
    assert "(all)" in rows
    assert all(r["kll_within_rank_tol"] for r in rows.values())
    # the merged row's count is the sum of the per-type counts
    assert rows["(all)"]["n_values"] == sum(
        r["n_values"] for k, r in rows.items() if k != "(all)"
    )
    # p50 ≤ p90 everywhere
    assert all(r["p50"] <= r["p90"] for r in rows.values())


# ---------------------------------------------------------------------------
# Graph: triangle orientation invariance + containment hot-gram cap
# ---------------------------------------------------------------------------


def test_triangle_count_degree_orientation_equals_id_orientation(spark):
    """VERDICT r05 task 3: the shipped degree-oriented wedge count must
    equal the simpler id-oriented form — the triangle count is
    orientation-invariant under ANY strict total order on vertices."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.tables import load_table

    n_deg = QUERIES["triangle_count"](spark, SF_SMOKE).collect()[0]["n_triangles"]

    li = load_table(spark, "lineitem", SF_SMOKE).select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.countDistinct("ok").alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
    )
    e1 = edges.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = edges.select(F.col("pa").alias("y"), F.col("pb").alias("z"))
    e3 = edges.select(F.col("pa").alias("x"), F.col("pb").alias("z"))
    n_id = e1.join(e2, "y").join(e3, ["x", "z"]).count()
    assert n_deg == n_id and n_deg > 0


def test_containment_cap_drops_injected_boilerplate_pairs(spark):
    """A shared trailing sentence gives every doc the same hot 3-grams;
    with the cap at (n_docs - 1) those grams are dropped from BOTH the
    intersection and the denominator, so two otherwise-disjoint docs
    must NOT pair; uncapped, the boilerplate alone can fake
    containment. Also pins the n_hot telemetry."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.queries_adv import containment_pairs_df

    boiler = "all rights reserved subscribe now terms apply here today"
    rows = [
        (1, "alpha beta gamma delta epsilon zeta " + boiler),
        (2, "one two three four five six " + boiler),
        (3, "alpha beta gamma delta epsilon zeta eta " + boiler),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    capped, n_hot = containment_pairs_df(docs, max_gram_df=2, threshold=0.4, count_dropped=True)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert n_hot > 0  # the boilerplate grams (df=3) were censused
    # doc 1 is contained in doc 3 on real content; doc 2 shares ZERO
    # non-boilerplate grams with anyone, so it pairs with nobody at any
    # threshold once the cap is on
    assert (1, 3) in got
    assert not any(2 in p for p in got)
    uncapped, n0 = containment_pairs_df(docs, max_gram_df=None, threshold=0.4)
    assert n0 == 0
    got_raw = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    assert any(2 in p for p in got_raw)  # boilerplate fakes containment


def test_containment_bucketed_prefix_candidates_equal_brute(spark):
    """r12 both-side prefix filtering (the bucketed B-prefix + true-α
    positional filter) must keep the pair set bit-identical to brute
    directed containment — the candidate narrowing is an exact
    superset-preserving prune, never a recall trade. The corpus mixes
    sizes across log2 buckets (tiny quote, mid doc, long doc) so the
    bucket fan-out and both positional filters are exercised."""
    import itertools

    from data_mastery_pipeline_spark.queries_adv import containment_pairs_df

    def grams(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    body = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, "w0 w1 w2 w3 w4"),                      # tiny: 3 grams
        (2, body),                                   # long: 38 grams
        (3, " ".join(f"w{i}" for i in range(8, 30))),  # mid, contained in 2
        (4, "x0 x1 x2 x3 x4 w0 w1 w2 w3 w4"),       # contains doc 1
        (5, " ".join(f"y{i}" for i in range(12))),   # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs_df(docs, max_gram_df=None, threshold=0.8)[0].collect()
    }
    gs = {i: grams(t) for i, t in rows}
    want = {}
    for a, b in itertools.permutations(gs, 2):
        if not gs[a]:
            continue
        c = len(gs[a] & gs[b]) / len(gs[a])
        if c >= 0.8:
            import math

            want[(a, b)] = math.floor(c * 10000 + 0.5) / 10000.0
    assert want  # the corpus really contains directed containment
    assert got == want
