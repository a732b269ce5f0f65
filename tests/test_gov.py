"""Governance / spatial / feature-store operator tests (round 7).

Oracle-parity of the registered queries is the driver's job
(tests/test_oracle_parity.py sweeps them); these tests pin the
PROPERTIES the oracles can't see: tokenization invariants, the grid
join's covering bound, point-in-time leakage-safety at the boundary.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_mastery_pipeline_spark import privacy
from data_mastery_pipeline_spark.operators import spatial
from data_mastery_pipeline_spark.operators.features import (
    point_in_time_features,
)


# ------------------------------------------------------------- privacy


def test_token_deterministic_join_preserving_and_null(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (1,), (None,)], "k int"
    ).select(privacy.token_col(F.col("k"), "s:").alias("t"), "k")
    rows = {r.k: r.t for r in df.distinct().collect()}
    assert rows[1] is not None and rows[1] == rows[1]  # defined
    assert rows[1] != rows[2]  # distinct keys → distinct tokens
    assert rows[None] is None  # NULL propagates, never a fake token
    assert len(rows[1]) == 64  # sha-256 hex
    # two independent tokenization sites agree (join preservation)
    again = spark.createDataFrame([(1,)], "k int").select(
        privacy.token_col(F.col("k"), "s:").alias("t")
    )
    assert again.first().t == rows[1]
    # salt changes the token universe
    other = spark.createDataFrame([(1,)], "k int").select(
        privacy.token_col(F.col("k"), "s2:").alias("t")
    )
    assert other.first().t != rows[1]


def test_laplace_noise_deterministic_zero_centered_and_finite(spark):
    n = 2000
    df = spark.range(n).select(
        privacy.laplace_noise_col(F.col("id"), "seed:", 20.0).alias("x")
    )
    stats = df.agg(
        F.avg("x").alias("m"),
        F.max(F.abs("x")).alias("mx"),
        F.count(F.when(F.isnan("x") | F.col("x").isNull(), 1)).alias(
            "bad"
        ),
    ).first()
    assert stats.bad == 0  # u never hits {0, ½, 1}: log stays finite
    # Laplace(b=20): mean 0, sd = b·√2 ≈ 28.3 → |mean of 2000| ≪ 3 sd/√n
    assert abs(stats.m) < 3.0
    assert stats.mx < 20.0 * 40  # tail bounded (P[|x|>36b] ~ e^-36)
    # deterministic: a second evaluation is bit-identical
    assert df.exceptAll(
        spark.range(n).select(
            privacy.laplace_noise_col(F.col("id"), "seed:", 20.0).alias(
                "x"
            )
        )
    ).count() == 0


def test_mask_name(spark):
    out = spark.createDataFrame([("Customer#42",)], "n string").select(
        privacy.mask_name_col(F.col("n")).alias("m")
    )
    assert out.first().m == "Cust***"


def test_policy_row_filter_pushes_to_scan(spark):
    """The governance claim that matters at 100 TB: the policy's row
    predicate must reach the parquet scan as a pushed filter, not run
    as a post-scan residual over ungoverned rows."""
    from data_mastery_pipeline_spark import queries_gov

    plan = (
        queries_gov.rls_scoped_export(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThanOrEqual(c_acctbal,0.0)" in plan.replace(" ", "")


# ------------------------------------------------------------- spatial


def _brute_pairs(pts_a, pts_b, radius_km):
    def hav(p, q):
        rl1, rl2 = math.radians(p[0]), math.radians(q[0])
        dlat = math.radians(q[0] - p[0]) / 2
        dlon = math.radians(q[1] - p[1]) / 2
        a = (
            math.sin(dlat) ** 2
            + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(min(1.0, a)))

    return {
        (i, j)
        for i, p in pts_a
        for j, q in pts_b
        if hav(p, q) < radius_km
    }


def test_grid_distance_join_equals_brute_force(spark):
    """The covering property under test: random clustered points, the
    grid join must return EXACTLY the brute-force pair set (a missed
    boundary-straddling pair is the classic grid-join bug)."""
    rng = random.Random(7)
    # clusters near cell corners + poles of the allowed band to stress
    # the boundary: points within ±60° lat like the synth generator
    pts = []
    for _ in range(120):
        base_lat = rng.choice([-59.9, -30.0, -0.01, 29.99, 59.9])
        base_lon = rng.choice([-179.9, -90.0, -0.01, 4.99, 175.0])
        pts.append(
            (
                max(-59.99, min(59.99, base_lat + rng.uniform(-3, 3))),
                ((base_lon + rng.uniform(-3, 3) + 180) % 360) - 180,
            )
        )
    left = [(i, p) for i, p in enumerate(pts[:80])]
    right = [(j, q) for j, q in enumerate(pts[80:])]
    ldf = spark.createDataFrame(
        [Row(id=i, lat=p[0], lon=p[1]) for i, p in left]
    )
    rdf = spark.createDataFrame(
        [Row(rid=j, lat=q[0], lon=q[1]) for j, q in right]
    )
    out = spatial.grid_distance_join(
        ldf, rdf, radius_km=300.0, cell_size_deg=5.0, max_abs_lat_deg=60.0
    )
    got = {(r.id, r.rid) for r in out.collect()}
    assert got == _brute_pairs(left, right, 300.0)


def test_neighbor_offsets_widen_near_pole():
    eq = spatial.neighbor_offsets(300.0, 5.0, 0.0)
    hi = spatial.neighbor_offsets(300.0, 5.0, 80.0)
    assert len(hi) > len(eq)  # cos-shrink demands more lon cells
    assert (0, 0) in eq and (-1, 0) in eq


# ------------------------------------------------------- feature store


def _ts(s):
    return f"2024-01-{s}"


def test_pit_features_strictly_before_and_staleness(spark):
    ev = spark.createDataFrame(
        [
            # user 1: click 10d before label, click 2d before label,
            # a view 1d before, and an event AT the label instant
            (1, 1, "2024-01-01 00:00:00", "click", 111.0),
            (2, 1, "2024-01-09 00:00:00", "click", 222.0),
            (3, 1, "2024-01-10 00:00:00", "view", 0.0),
            (4, 1, "2024-01-10 12:00:00", "view", 0.0),
            (8, 1, "2024-01-11 00:00:00", "view", 0.0),  # AT label ts
            (5, 1, "2024-01-11 00:00:00", "purchase", 9.0),  # label
            # user 2: only a STALE click (5d before label)
            (6, 2, "2024-01-06 00:00:00", "click", 333.0),
            (7, 2, "2024-01-11 00:00:00", "purchase", 9.0),  # label
        ],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = {
        r.event_id: r
        for r in point_in_time_features(
            ev,
            labels,
            "user_id",
            "ts",
            7,
            "value",
            F.col("event_type") == "click",
            3,
            carry_cols=("event_id",),
        ).collect()
    }
    # user 1: events within [label-7d, label) = ids 2,3,4. Id 8 sits
    # AT the label instant → excluded (strict-before), id 1 is 10d
    # old → outside the horizon, the label itself never self-counts.
    assert out[5].evt_7d == 3
    # last click within 3d staleness = id 2 (222.0); id 1 is stale
    assert out[5].last_value == 222.0
    # user 2: click is 5d old → staleness NULL, not the stale value
    assert out[7].last_value is None
    assert out[7].evt_7d == 1  # the click still counts as an event


def test_pit_same_timestamp_feature_events_resolve_deterministically(
    spark,
):
    """Two qualifying clicks at the SAME instant: max value wins (the
    (ts, value) composite ordering) — matching the oracle's
    ORDER BY ts DESC, value DESC, so engine parity cannot flap
    (review r7)."""
    ev = spark.createDataFrame(
        [
            (1, 1, "2024-01-10 00:00:00", "click", 5.0),
            (2, 1, "2024-01-10 00:00:00", "click", 9.0),
            (3, 1, "2024-01-11 00:00:00", "purchase", 1.0),
        ],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = point_in_time_features(
        ev,
        labels,
        "user_id",
        "ts",
        7,
        "value",
        F.col("event_type") == "click",
        3,
        carry_cols=("event_id",),
    ).collect()
    assert out[0].last_value == 9.0


def test_pit_probes_do_not_contaminate_each_other(spark):
    # two labels for one user, 1 day apart, no other events: each
    # label's evt count must ignore the other PROBE (weight 0) but
    # count the other label's underlying EVENT when it precedes it
    ev = spark.createDataFrame(
        [
            (1, 1, "2024-01-10 00:00:00", "purchase", 1.0),
            (2, 1, "2024-01-11 00:00:00", "purchase", 1.0),
        ],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    labels = ev.select("user_id", "ts", "event_id")
    out = {
        r.event_id: r.evt_7d
        for r in point_in_time_features(
            ev,
            labels,
            "user_id",
            "ts",
            7,
            "value",
            F.col("event_type") == "click",
            3,
            carry_cols=("event_id",),
        ).collect()
    }
    assert out[1] == 0  # nothing before the first label
    assert out[2] == 1  # the first PURCHASE EVENT counts; its probe not
