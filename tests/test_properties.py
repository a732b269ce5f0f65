"""Property-based tests (hypothesis) — invariants the example-based
suites can't sweep: random inputs, adversarial floats, empty/degenerate
shapes. The reference has no property tests at all (SURVEY §5); these
run the REAL Spark operators on generated frames.

Spark round-trips per example are expensive → small deadline-free
profiles with capped example counts; the generators aim at structure
(duplicates, ties, nulls, hot keys), not volume.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_mastery_pipeline_spark.operators import cleaning, skew

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, tiebreak_ts, value) rows with deliberately colliding keys/ts
ROWS = st.lists(
    st.tuples(
        st.integers(0, 5),                      # key: few values → many dups
        st.integers(0, 3),                      # ts: ties guaranteed
        st.floats(-1e6, 1e6, allow_nan=False),
    ),
    min_size=0,
    max_size=60,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame([(int(k), int(t), float(v)) for k, t, v in rows], SCHEMA)


@SET
@given(rows=ROWS)
def test_dedup_deterministic_is_a_function_of_the_set(spark, rows):
    """Exactly one row per key survives; WHICH row is fixed by the
    ordering regardless of input partitioning/arrival order."""
    df = _df(spark, rows)
    out = cleaning.dedup_deterministic(df, ["k"], [F.desc("ts"), F.desc("v")])
    got = {r["k"]: (r["ts"], r["v"]) for r in out.collect()}
    keys = {k for k, _, _ in rows}
    assert got.keys() == keys
    for k in keys:
        expected = max(((t, v) for kk, t, v in rows if kk == k))
        assert got[k] == expected
    # arrival order must not matter
    out2 = cleaning.dedup_deterministic(
        _df(spark, list(reversed(rows))), ["k"], [F.desc("ts"), F.desc("v")]
    )
    assert {r["k"]: (r["ts"], r["v"]) for r in out2.collect()} == got


@SET
@given(rows=ROWS)
def test_salted_aggregate_equals_plain_aggregate(spark, rows):
    df = _df(spark, rows)
    salted = skew.salted_aggregate(
        df, ["k"],
        [("sum", "v", "s"), ("count", "v", "n"), ("min", "v", "lo"), ("max", "v", "hi")],
        salt_buckets=7,
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("v").alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    a = {r["k"]: r for r in salted.collect()}
    b = {r["k"]: r for r in plain.collect()}
    assert a.keys() == b.keys()
    for k in b:
        assert math.isclose(a[k]["s"], b[k]["s"], rel_tol=1e-9, abs_tol=1e-9)
        assert (a[k]["n"], a[k]["lo"], a[k]["hi"]) == (b[k]["n"], b[k]["lo"], b[k]["hi"])


@SET
@given(rows=ROWS, keys=st.lists(st.integers(0, 5), max_size=6))
def test_idempotent_append_never_duplicates_keys(spark, rows, keys):
    """Appending any batch against any existing key set adds only unseen
    keys — the S14 contract that makes replays harmless."""
    new = _df(spark, rows)
    existing = spark.createDataFrame([(int(k),) for k in keys], "k long")
    fresh = cleaning.idempotent_append(new, existing, ["k"])
    fresh_keys = {r["k"] for r in fresh.select("k").distinct().collect()}
    assert fresh_keys.isdisjoint(set(keys))
    # nothing new is lost: every input key not already present survives
    assert fresh_keys == {k for k, _, _ in rows} - set(keys)


# --- time-bucket range join ≡ naive cross-join filter -----------------------

TS_ROWS = st.lists(st.integers(0, 600), min_size=0, max_size=25)


@SET
@given(left=TS_ROWS, right=TS_ROWS, tol=st.integers(1, 120))
def test_time_bucket_range_join_equals_naive(spark, left, right, tol):
    """Bucketed range join == brute-force |l-r| <= tol on random second
    offsets, for arbitrary tolerances — exercises the bucket±1 boundary
    (an off-by-one there silently drops edge pairs)."""
    from data_mastery_pipeline_spark.operators import joins as bjoins

    l = spark.createDataFrame(
        [(i, s) for i, s in enumerate(left)], "lid long, sec long"
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    r = spark.createDataFrame(
        [(i, s) for i, s in enumerate(right)], "rid long, sec long"
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")

    got = bjoins.time_bucket_range_join(l, r, "ts", "ts", tolerance_seconds=tol)
    got_pairs = sorted((x["l_lid"], x["r_rid"]) for x in got.collect())
    want_pairs = sorted(
        (i, j)
        for i, ls in enumerate(left)
        for j, rs in enumerate(right)
        if abs(ls - rs) <= tol
    )
    assert got_pairs == want_pairs


# --- sessionize ≡ per-key python simulation ---------------------------------


@SET
@given(rows=ROWS, gap=st.integers(1, 4))
def test_sessionize_matches_python_simulation(spark, rows, gap):
    from collections import defaultdict

    from data_mastery_pipeline_spark.operators import windows as bwin

    df = _df(spark, rows).withColumn("t", F.timestamp_seconds("ts"))
    out = bwin.sessionize(df, keys=["k"], ts_col="t", gap_seconds=gap, tiebreak=["v"])
    got = {
        (r["k"], r["ts"], r["v"]): r["session_id"] for r in out.collect()
    }

    by_key = defaultdict(list)
    for k, ts, v in rows:
        by_key[int(k)].append((int(ts), float(v)))
    want = {}
    for k, evs in by_key.items():
        sid, prev = 0, None
        for ts, v in sorted(evs):
            if prev is None or ts - prev > gap:
                sid += 1
            want[(k, ts, v)] = sid
            prev = ts
    assert got == want


# --- per-key recurrence (operators/recurrence.py) --------------------------

EWMA_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # key (few → long runs)
        st.integers(min_value=0, max_value=10**6),    # order
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=60,
)


@SET
@given(rows=EWMA_ROWS, alpha=st.floats(min_value=0.05, max_value=0.95))
def test_ewma_matches_reference_recursion(spark, rows, alpha):
    from data_mastery_pipeline_spark.operators import recurrence

    # unique (key, order) so the ordering is total
    dedup = {(k, o): v for k, o, v in rows}
    rows = [(k, o, v) for (k, o), v in sorted(dedup.items())]
    df = spark.createDataFrame(rows, "k long, o long, v double")
    got = {
        (r.k, r.o): r.ewma
        for r in recurrence.ewma_per_key(
            df, key_cols=["k"], order_cols=["o"], value_col="v", alpha=alpha
        ).collect()
    }
    # reference: plain Python recursion per key in order
    prev: dict[int, float] = {}
    for k, o, v in rows:
        prev[k] = v if k not in prev else alpha * v + (1.0 - alpha) * prev[k]
        assert got[(k, o)] == prev[k], (k, o)
    assert len(got) == len(rows)


# ---- bloom semi-join: no false negatives, ever ------------------------------

KEYSETS = st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=40, unique=True)


@given(keys=KEYSETS)
@SET
def test_bloom_never_drops_a_true_key(spark, keys):
    """∀ key sets (including negatives, extremes, empty): every built
    key passes its own bloom — the property the pruned join's
    exactness rests on."""
    from data_mastery_pipeline_spark.operators import bloomjoin

    if not keys:
        return
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bloom = bloomjoin.build_bloom(df, "k", num_bits=1 << 12)
    missed = (
        df.join(F.broadcast(bloom))
        .filter(~bloomjoin.might_contain("k", 1 << 12))
        .count()
    )
    assert missed == 0


# ---- connected components: driver finish ≡ distributed ≡ brute force --------

EDGES = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=40,
)


def _brute_components(edges):
    """Reference labeling by repeated relaxation (O(V·E), fine at n≤16)."""
    nodes = {n for e in edges for n in e}
    lab = {n: n for n in nodes}
    for _ in range(len(nodes)):
        for a, b in edges:
            m = min(lab[a], lab[b])
            lab[a] = lab[b] = m
    # one more sweep to fixpoint
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(lab[a], lab[b])
            if lab[a] != m or lab[b] != m:
                lab[a] = lab[b] = m
                changed = True
    return lab


@given(edges=EDGES)
@SET
def test_cc_both_paths_match_brute_force(spark, edges):
    """∀ random multigraphs (self-loops, duplicates, both orientations):
    the bounded driver finish and the pure distributed iteration agree
    with an independent O(V·E) reference labeling."""
    from data_mastery_pipeline_spark.dedup import components

    # self-loops stay IN (review r6, 9th pass: they were stripped before
    # the operator ran, so the docstring's self-loop claim was untested —
    # a lone (x, x) edge must yield the singleton component {x: x})
    if not edges:
        return
    want = _brute_components(edges)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got_local = {
        r["id"]: r["component"]
        for r in components.connected_components(df).collect()
    }
    assert got_local == want
    got_dist = {
        r["id"]: r["component"]
        for r in components.connected_components(df, finish_threshold=0).collect()
    }
    assert got_dist == want


# --- alpha-temperature mixture resampling (operators/sampling.py, r10)

MIX_ROWS = st.lists(
    st.tuples(
        st.integers(0, 10_000),   # id (collisions fine — gate is a fn of id)
        st.integers(0, 4),        # stratum: skew guaranteed by small domain
    ),
    min_size=1,
    max_size=80,
)


@SET
@given(rows=MIX_ROWS, alpha=st.sampled_from([0.0, 0.3, 0.5, 1.0]))
def test_alpha_mixture_rates_invariants(spark, rows, alpha):
    """For ANY corpus and temperature: rates live in (0, 1]; α = 1 is
    plain uniform thinning (every stratum gets the target fraction);
    expected sample size never exceeds the target above rounding; and
    the resample keeps EXACTLY the rows under the gate cut
    (determinism: running twice yields the identical set)."""
    from data_mastery_pipeline_spark.operators import sampling

    df = spark.createDataFrame(
        [(int(i), f"s{g}") for i, g in rows], "id long, grp string"
    )
    rates = {
        r["stratum"]: r
        for r in sampling.alpha_mixture_rates(
            df, "grp", alpha=alpha, target_fraction=0.5
        ).collect()
    }
    n = len(rows)
    assert all(0.0 < r["rate"] <= 1.0 for r in rates.values())
    if alpha == 1.0:
        for r in rates.values():
            assert math.isclose(r["rate"], 0.5, rel_tol=1e-9)
    expected = sum(r["rate"] * r["n_rows"] for r in rates.values())
    assert expected <= 0.5 * n + 1e-6 + len(rates)  # min(1,·) caps only lower
    gate = sampling.affine_gate("id", salt=31)
    got1 = sorted(
        tuple(r)
        for r in sampling.alpha_mixture_resample(
            df, "grp", gate, alpha=alpha, target_fraction=0.5
        ).collect()
    )
    got2 = sorted(
        tuple(r)
        for r in sampling.alpha_mixture_resample(
            df, "grp", gate, alpha=alpha, target_fraction=0.5
        ).collect()
    )
    assert got1 == got2  # pure function of ids — no RNG anywhere
    kept = {(i, g) for i, g in got1}
    assert kept <= {(int(i), f"s{g}") for i, g in rows}


@SET
@given(rows=MIX_ROWS)
def test_alpha_tempering_upweights_low_resource(spark, rows):
    """α < 1 must never give a lower keep-rate to a SMALLER stratum:
    rate ∝ n^(α−1) is non-increasing in n."""
    from data_mastery_pipeline_spark.operators import sampling

    df = spark.createDataFrame(
        [(int(i), f"s{g}") for i, g in rows], "id long, grp string"
    )
    rates = sampling.alpha_mixture_rates(
        df, "grp", alpha=0.5, target_fraction=0.3
    ).collect()
    by_n = sorted(((r["n_rows"], r["rate"]) for r in rates))
    for (n1, r1), (n2, r2) in zip(by_n, by_n[1:]):
        if n1 < n2:
            assert r1 >= r2 - 1e-12


# --- LSH edit-distance join (dedup/editjoin.py, r10): precision is
# STRUCTURAL — the verified output is a subset of the brute join for
# ANY corpus (recall is probabilistic, subset-ness is not), and exact
# duplicates (J = 1) are caught with probability exactly 1.


@SET
@given(
    heads=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=40),
        min_size=0,
        max_size=12,
    )
)
def test_edit_lsh_subset_and_exact_twin_guarantees(spark, heads):
    from data_mastery_pipeline_spark.dedup import editjoin

    rows = [(i, "en", h) for i, h in enumerate(heads)]
    # one guaranteed exact twin when the corpus is non-empty
    if heads:
        rows.append((len(rows), "en", heads[0]))
    df = spark.createDataFrame(rows, "doc_id long, lang string, head string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in editjoin.edit_near_pairs_lsh(
            df, k=4, q=3, id_col="doc_id", text_col="head", block_col="lang"
        ).collect()
    }
    lev = {}
    a = df.selectExpr("doc_id id_a", "head ha")
    b = df.selectExpr("doc_id id_b", "head hb")
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.levenshtein("ha", "hb").alias("d"))
        .filter(F.col("d") <= 4)
        .collect()
    )
    for r in brute:
        lev[(r["id_a"], r["id_b"])] = r["d"]
    # subset with EXACT distances
    for pair, d in got.items():
        assert pair in lev and lev[pair] == d
    # the J=1 twin always surfaces
    if heads:
        assert (0, len(rows) - 1) in got and got[(0, len(rows) - 1)] == 0
