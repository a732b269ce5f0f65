"""Invariant + plan tests for the operational-analytics queries
(queries_ops.py). Oracle parity proves value equality; these pin the
semantics and plan shapes parity cannot see.
"""

from __future__ import annotations

import math

import data_mastery_pipeline_spark.queries_ops  # noqa: F401
from data_mastery_pipeline_spark.plans import inspect as plans
from data_mastery_pipeline_spark.registry import QUERIES

from conftest import SF_SMOKE


def test_attribution_conserves_purchase_value(spark, duck):
    """Attribution redistributes purchase value; it must not create or
    destroy any: sum over channels == total purchase value."""
    rows = QUERIES["purchase_attribution"](spark, SF_SMOKE).collect()
    assert rows
    total_n, total_v = duck.sql(
        f"SELECT count(*), sum(value) FROM read_parquet('{SF_SMOKE}/events.parquet') "
        "WHERE event_type = 'purchase'"
    ).fetchone()
    assert sum(r["n_purchases"] for r in rows) == total_n
    assert math.isclose(
        sum(r["attributed_value"] for r in rows), total_v, rel_tol=1e-6
    )
    # channels are non-purchase types (or 'direct'): a purchase never
    # credits itself
    assert "purchase" not in {r["channel"] for r in rows}
    # single window pass, no self-join
    df = QUERIES["purchase_attribution"](spark, SF_SMOKE)
    assert plans.scan_count(df) == 1


def test_forecast_backtest_leakfree_and_bounded(spark):
    rows = QUERIES["weekday_forecast_backtest"](spark, SF_SMOKE).collect()
    # all 7 ISO weekdays have ≥4 weeks of history in the 6-year span
    assert [r["dow"] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    assert all(r["mape"] >= 0.0 for r in rows)
    # scored days exclude the first 4 same-weekday occurrences
    assert all(r["n_days"] > 50 for r in rows)


def test_boilerplate_share_is_a_fraction_per_source(spark, duck):
    rows = QUERIES["boilerplate_ngram_share"](spark, SF_SMOKE).collect()
    assert rows
    assert all(0.0 <= r["avg_boilerplate_share"] <= 1.0 for r in rows)
    n_docs = duck.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_quarantine_partitions_the_table(spark, duck):
    rows = QUERIES["events_quarantine"](spark, SF_SMOKE).collect()
    n_events = duck.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()[0]
    # reasons partition the table; shares sum to ~1
    assert sum(r["n"] for r in rows) == n_events
    assert math.isclose(sum(r["share"] for r in rows), 1.0, abs_tol=1e-4)
    by = {r["reason"]: r["n"] for r in rows}
    assert by.get("ok", 0) > 0
    # k ~ U(0..99) → the >90 rule must genuinely fire
    assert by.get("k_out_of_range", 0) > 0
    assert set(by) <= {
        "ok", "missing_k", "k_out_of_range", "negative_value", "unknown_type"
    }


def test_pagerank_is_a_distribution_and_iterations_converge(spark):
    rows = QUERIES["pagerank_event_types"](spark, SF_SMOKE).collect()
    assert len(rows) == 5  # the five event types
    assert math.isclose(sum(r["rank"] for r in rows), 1.0, abs_tol=1e-4)
    assert all(r["rank"] > 0.0 for r in rows)
    # ranks are non-degenerate (the transition graph is not uniform)
    assert len({r["rank"] for r in rows}) > 1


def test_pagerank_rank_relation_stays_broadcast(spark):
    df = QUERIES["pagerank_event_types"](spark, SF_SMOKE)
    # every iteration's rank⋈edges join is broadcast — 3 iterations → ≥3
    assert plans.broadcast_join_count(df) >= 3
    assert plans.cartesian_product_count(df) == 0


def test_incremental_dedup_pairs_are_strictly_cross_side(spark):
    rows = QUERIES["incremental_minhash_dedup"](spark, SF_SMOKE).collect()
    assert rows, "corpus contains cross-side near-dups"
    assert all(r["id_new"] % 5 == 0 for r in rows)
    assert all(r["id_index"] % 5 != 0 for r in rows)
    assert all(0.35 <= r["jaccard"] <= 1.0 for r in rows)


def test_bm25_scores_positive_and_rare_term_dominates(spark, duck):
    rows = QUERIES["bm25_search"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # 'dup' is the rarest query term → top hit must contain it (idf
    # dominance is the point of BM25 over raw tf)
    top_text = duck.sql(
        f"SELECT text FROM read_parquet('{SF_SMOKE}/documents.parquet') "
        f"WHERE doc_id = {rows[0]['doc_id']}"
    ).fetchone()[0]
    assert "dup" in top_text.split()


def test_ab_variants_partition_users_and_z_matches_rates(spark, duck):
    import math as _m

    rows = {r["variant"]: r for r in QUERIES["ab_test_conversion"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B"}
    n_users = duck.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()[0]
    assert rows["A"]["n_users"] + rows["B"]["n_users"] == n_users
    # rates are valid proportions; the POOLED rate is non-degenerate
    # (per-variant zeros are legitimate at the 15-user smoke SF)
    for r in rows.values():
        assert 0.0 <= r["conv_rate"] < 1.0
    na, ca = rows["A"]["n_users"], rows["A"]["n_conv"]
    nb, cb = rows["B"]["n_users"], rows["B"]["n_conv"]
    p = (ca + cb) / (na + nb)
    assert 0.0 < p < 1.0
    # z recomputed from the reported counts matches the reported z
    z = (ca / na - cb / nb) / _m.sqrt(p * (1 - p) * (1 / na + 1 / nb))
    assert abs(z - rows["A"]["z_score"]) < 1e-3
    assert rows["A"]["z_score"] == rows["B"]["z_score"]


def test_chi2_contribs_nonnegative_all_types(spark):
    rows = QUERIES["chi2_type_value"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert all(r["chi2_contrib"] >= 0.0 for r in rows)
    assert all(1 <= r["n_cells"] <= 4 for r in rows)


def test_path_regex_counts_match_direct_recompute(spark, duck):
    row = QUERIES["path_regex_funnel"](spark, SF_SMOKE).collect()[0]
    n_users, n_matched = duck.sql(
        f"""
        WITH p AS (
          SELECT user_id,
                 string_agg(substr(event_type,1,1), '' ORDER BY ts, event_id) AS path
          FROM read_parquet('{SF_SMOKE}/events.parquet') GROUP BY 1
        ) SELECT count(*), sum(CASE WHEN regexp_matches(path, 's[^e]*p') THEN 1 ELSE 0 END) FROM p
        """
    ).fetchone()
    assert row["n_users"] == n_users
    assert row["n_matched"] == n_matched
    assert 0.0 <= row["match_share"] <= 1.0


def test_weighted_sample_exactly_k_per_source_and_repartition_stable(spark):
    df = QUERIES["weighted_sample_per_source"](spark, SF_SMOKE)
    rows = df.collect()
    from collections import Counter

    per_src = Counter(r["source"] for r in rows)
    # exactly k per source (every source has ≥5 docs even at smoke SF)
    assert all(n == 5 for n in per_src.values())
    assert all(1 <= r["rk"] <= 5 for r in rows)
    # derandomized: a second evaluation draws the identical sample
    again = {(r["source"], r["rk"]): r["doc_id"] for r in df.collect()}
    assert {(r["source"], r["rk"]): r["doc_id"] for r in rows} == again


def test_revenue_trend_covers_all_nations_r2_bounded(spark):
    rows = QUERIES["revenue_trend_by_nation"](spark, SF_SMOKE).collect()
    assert len(rows) == 25
    assert all(0.0 <= r["r2"] <= 1.0 for r in rows)
    # sf0.001 nations can be as thin as ~25 distinct order days
    assert all(r["n_days"] >= 20 for r in rows)


def test_embedding_correlations_single_scan_symmetric_domain(spark):
    df = QUERIES["embedding_dim_correlations"](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == 28  # C(8,2) upper triangle
    assert all(r["dim_i"] < r["dim_j"] for r in rows)
    assert all(-1.0 <= r["corr"] <= 1.0 for r in rows)
    # all 28 correlations come from ONE scan (the oracle's 28 scans are
    # the readable formulation, not the plan)
    assert plans.scan_count(df) == 1


def test_cross_near_dups_caps_degenerate_buckets(spark):
    """The max_bucket guard: a boilerplate bucket with M index × N
    arrival collisions must not emit M×N candidates (the all-pairs
    blowup incremental dedup exists to avoid)."""
    from data_mastery_pipeline_spark.dedup.minhash import cross_near_dups

    text = "the same exact boilerplate text repeated over and over again " * 3
    idx = spark.createDataFrame(
        [(i, text) for i in range(30)], "doc_id long, text string"
    )
    inc = spark.createDataFrame(
        [(1000 + i, text) for i in range(30)], "doc_id long, text string"
    )
    capped = cross_near_dups(idx, inc, jaccard_threshold=0.3, max_bucket=10)
    assert capped.count() == 0  # every bucket oversized → guarded out
    uncapped = cross_near_dups(idx, inc, jaccard_threshold=0.3, max_bucket=1000)
    assert uncapped.count() == 900  # 30 × 30 exact-dup cross pairs


def test_shared_spans_exact_on_constructed_overlap(spark):
    """Two docs sharing a verbatim 25-token run (and nothing else) must
    report max_span_tokens == 25 exactly — span lengths are exact, not
    heuristic."""
    from data_mastery_pipeline_spark.dedup.spans import shared_spans

    shared = " ".join(f"s{i}" for i in range(25))
    a = "preamble one two three " + shared + " coda alpha beta"
    b = "totally different opening words here " + shared + " closing run"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, "unrelated text with no overlap at all")],
        "doc_id long, text string",
    )
    rows = shared_spans(docs, k=10, min_span=20).collect()
    assert {(r["id_a"], r["id_b"]): r["max_span_tokens"] for r in rows} == {
        (1, 2): 25
    }


def test_shared_spans_query_pairs_are_near_dups(spark):
    rows = QUERIES["shared_substring_spans"](spark, SF_SMOKE).collect()
    assert rows, "smoke corpus contains verbatim 20+-token overlaps"
    assert all(r["max_span_tokens"] >= 20 for r in rows)
    assert all(r["n_spans"] >= 1 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_rolling_wau_monotone_vs_daily_and_bounded(spark, duck):
    rows = QUERIES["rolling_7d_active_users"](spark, SF_SMOKE).collect()
    assert len(rows) >= 25  # ~30 distinct days in the corpus
    daily = dict(
        duck.sql(
            f"SELECT CAST(ts AS DATE), count(DISTINCT user_id) "
            f"FROM read_parquet('{SF_SMOKE}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    total_users = duck.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()[0]
    for r in rows:
        # WAU ≥ that day's DAU and ≤ the total user universe
        assert daily[r["day"]] <= r["wau"] <= total_users


def test_linear_attribution_conserves_touched_purchase_value(spark, duck):
    """Linear attribution conserves exactly the value of purchases that
    HAVE a prior touch (no-touch purchases are last-touch's 'direct')."""
    rows = QUERIES["linear_attribution"](spark, SF_SMOKE).collect()
    assert rows
    touched_value = duck.sql(
        f"""
        SELECT sum(value) FROM read_parquet('{SF_SMOKE}/events.parquet') p
        WHERE event_type = 'purchase' AND EXISTS (
          SELECT 1 FROM read_parquet('{SF_SMOKE}/events.parquet') e
          WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
            AND (e.ts < p.ts OR (e.ts = p.ts AND e.event_id < p.event_id))
        )
        """
    ).fetchone()[0]
    assert math.isclose(
        sum(r["attributed_value"] for r in rows), touched_value, rel_tol=1e-6
    )
    assert "purchase" not in {r["channel"] for r in rows}


def test_decile_lift_weighted_rates_average_to_one(spark):
    rows = QUERIES["user_value_decile_lift"](spark, SF_SMOKE).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n = sum(r["n_users"] for r in rows)
    # user-weighted mean lift is 1 by construction
    wmean = sum(r["lift"] * r["n_users"] for r in rows) / n
    assert math.isclose(wmean, 1.0, abs_tol=0.01)
    assert all(r["rate"] >= 0.0 for r in rows)


def test_cluster_size_histogram_accounts_every_clustered_doc(spark, duck):
    import data_mastery_pipeline_spark.queries_ext  # noqa: F401

    rows = QUERIES["near_dup_cluster_sizes"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r["cluster_size"] >= 2 for r in rows)  # singletons aren't clusters
    # histogram mass equals the clustered-doc count from the member query
    n_docs = sum(r["cluster_size"] * r["n_clusters"] for r in rows)
    members = QUERIES["near_dup_clusters"](spark, SF_SMOKE)
    assert n_docs == members.count()
