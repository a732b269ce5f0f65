"""operators/ranks.py: exact distributed row_number / ntile / prefix
sums, verified value-for-value against the single-task window forms
they replace, plus the plan property the module exists for (no
unpartitioned WindowExec)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.operators import ranks
from data_mastery_pipeline_spark.plans import inspect


@pytest.fixture(scope="module")
def df(spark):
    random.seed(7)
    rows = [
        (
            i,
            random.choice([1.0, 2.0, 2.0, 3.5, None, 7.0, 7.0, 7.0]),
            random.randint(0, 5),
        )
        for i in range(2000)
    ]
    return spark.createDataFrame(rows, "id long, v double, w int").cache()


def _by_id(frame, col):
    return {r["id"]: r[col] for r in frame.collect()}


@pytest.mark.parametrize("direction", ["asc", "desc"])
def test_row_number_matches_window_form(df, direction):
    got = ranks.with_global_row_number(
        df, [("v", direction), ("id", "asc")], out="rn", n_buckets=7
    )
    order = (
        F.col("v").asc() if direction == "asc" else F.col("v").desc()
    )
    ref = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(order, F.col("id")))
    )
    assert _by_id(got, "rn") == _by_id(ref, "rn")


@pytest.mark.parametrize("n", [3, 5, 10, 3000])
def test_ntile_matches_window_form(df, n):
    """Covers even split, remainder tiles, and n > N (one row per
    tile) — the SQL-standard first-r-tiles-get-the-extra-row rule."""
    got = ranks.exact_ntile(
        df, [("v", "desc"), ("id", "asc")], n, out="tile", n_buckets=5
    )
    ref = df.withColumn(
        "tile",
        F.ntile(n).over(Window.orderBy(F.col("v").desc(), F.col("id"))),
    )
    assert _by_id(got, "tile") == _by_id(ref, "tile")


@pytest.mark.parametrize("inclusive", [True, False])
def test_prefix_sum_matches_window_form(df, inclusive):
    dv = df.filter("v is not null").groupBy("v").agg(
        F.count("*").alias("t")
    )
    got = ranks.with_prefix_sum(
        dv, [("v", "asc")], "t", out="c", inclusive=inclusive, n_buckets=4
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("t").over(w)
    ref = dv.withColumn(
        "c", cum if inclusive else cum - F.col("t")
    )
    a = sorted((r.v, r.c) for r in got.collect())
    b = sorted((r.v, r.c) for r in ref.collect())
    assert a == b


def test_no_unpartitioned_window_in_own_plan(df):
    """The whole point: the helper's plan must contain ONLY
    bucket-partitioned windows."""
    got = ranks.exact_ntile(
        df, [("v", "asc"), ("id", "asc")], 10, out="tile"
    )
    assert inspect.unpartitioned_window_count(got) == 0
    got2 = ranks.with_global_row_number(df, [("v", "asc"), ("id", "asc")])
    assert inspect.unpartitioned_window_count(got2) == 0


def test_single_bucket_degenerate(spark):
    """Constant key: every row lands in one bucket (rank semantics
    forbid splitting ties) — results must still be exact."""
    d = spark.createDataFrame(
        [(i, 1.0) for i in range(20)], "id long, v double"
    )
    got = ranks.with_global_row_number(
        d, [("v", "asc"), ("id", "asc")], out="rn"
    )
    assert _by_id(got, "rn") == {i: i + 1 for i in range(20)}


def test_empty_input(spark):
    d = spark.createDataFrame([], "id long, v double")
    assert (
        ranks.exact_ntile(d, [("v", "asc"), ("id", "asc")], 4).count() == 0
    )


def test_with_prefix_sums_matches_singles(spark):
    from data_mastery_pipeline_spark.operators import ranks
    from pyspark.sql import functions as F

    rows = [(float(i % 7), float(i % 3), float(1)) for i in range(200)]
    rows += [(None, 1.0, 1.0)]  # NULL order key
    df = spark.createDataFrame(rows, "v double, w1 double, w2 double")
    multi = ranks.with_prefix_sums(
        df, [("v", "asc")], ["w1", "w2"], ["c1", "c2"]
    )
    s1 = ranks.with_prefix_sum(df, [("v", "asc")], "w1", out="c1")
    s2 = ranks.with_prefix_sum(df, [("v", "asc")], "w2", out="c2")

    def _grp(d, col):
        # ties share no deterministic intra-order: compare per-v final
        # cumulative (max) values which are order-invariant
        return sorted(
            (
                tuple(r)
                for r in d.groupBy("v").agg(F.max(col).alias("m")).collect()
            ),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    assert _grp(multi, "c1") == _grp(s1, "c1")
    assert _grp(multi, "c2") == _grp(s2, "c2")
    # exclusive form agrees too
    me = ranks.with_prefix_sums(
        df, [("v", "asc")], ["w1"], ["e1"], inclusive=False
    )
    se = ranks.with_prefix_sum(
        df, [("v", "asc")], "w1", out="e1", inclusive=False
    )
    assert _grp(me, "e1") == _grp(se, "e1")


@pytest.fixture(scope="module")
def nan_df(spark):
    """Values mixing NaN, NULL, and finite keys: Spark's sort places
    NULLs first (ASC) / last (DESC) and NaN GREATER than every finite
    value in both directions — the bucketing must agree."""
    random.seed(11)
    nan = float("nan")
    rows = [
        (i, random.choice([1.0, 2.5, nan, None, 7.0, nan, -3.0]))
        for i in range(500)
    ]
    return spark.createDataFrame(rows, "id long, v double").cache()


@pytest.mark.parametrize("direction", ["asc", "desc"])
def test_row_number_with_nan_keys(nan_df, direction):
    got = ranks.with_global_row_number(
        nan_df, [("v", direction), ("id", "asc")], out="rn", n_buckets=6
    )
    order = (
        F.col("v").asc() if direction == "asc" else F.col("v").desc()
    )
    ref = nan_df.withColumn(
        "rn", F.row_number().over(Window.orderBy(order, F.col("id")))
    )
    assert _by_id(got, "rn") == _by_id(ref, "rn")


@pytest.mark.parametrize("direction", ["asc", "desc"])
def test_ntile_with_nan_keys(nan_df, direction):
    got = ranks.exact_ntile(
        nan_df, [("v", direction), ("id", "asc")], 7, out="tile",
        n_buckets=4,
    )
    order = (
        F.col("v").asc() if direction == "asc" else F.col("v").desc()
    )
    ref = nan_df.withColumn(
        "tile", F.ntile(7).over(Window.orderBy(order, F.col("id")))
    )
    assert _by_id(got, "tile") == _by_id(ref, "tile")


@pytest.fixture(scope="module")
def skew_df(spark):
    """60% of rows share one key — the hot-bucket degenerate case the
    module header documents for the rank-semantics form."""
    random.seed(23)
    rows = [
        (i, 42.0 if random.random() < 0.6
         else random.choice([1.0, 2.0, 50.0, 99.0, None]))
        for i in range(3000)
    ]
    return spark.createDataFrame(rows, "id long, v double").cache()


@pytest.mark.parametrize("kdir,tdir", [
    ("asc", "asc"), ("desc", "asc"), ("asc", "desc"), ("desc", "desc"),
])
def test_salted_row_number_equals_unsalted(skew_df, kdir, tdir):
    order = [("v", kdir), ("id", tdir)]
    got = ranks.with_global_row_number_salted(
        skew_df, order, out="rn", n_buckets=8
    )
    ref = ranks.with_global_row_number(skew_df, order, out="rn",
                                       n_buckets=8)
    assert _by_id(got, "rn") == _by_id(ref, "rn")


def test_salted_row_number_splits_the_hot_key(spark, skew_df):
    """The point of the variant: the hot key's rows must NOT all share
    one window partition. Count distinct internal buckets among
    hot-key rows via the composite bucket expression (re-derived from
    the plan by running the bucketing stage alone)."""
    from pyspark.sql import functions as F2

    got = ranks.with_global_row_number_salted(
        skew_df, [("v", "asc"), ("id", "asc")], out="rn", n_buckets=8
    )
    # correctness of numbering over the hot key specifically
    hot_rows = got.filter("v = 42.0").select("rn").collect()
    rns = sorted(r["rn"] for r in hot_rows)
    assert rns == list(range(rns[0], rns[0] + len(rns)))  # contiguous
    # unsalted: the documented degenerate case — ONE bucket holds all
    # hot rows
    w_in = ranks._with_ordered_buckets(
        skew_df, [("v", "asc")], 8
    ).filter("v = 42.0").select(ranks._B).distinct().count()
    assert w_in == 1
    # salted: the hot key's rows spread over several window buckets,
    # and the largest bucket holds well under the hot key's full mass
    ranks._SALTED_BUCKET_PROBE = probe = []
    try:
        ranks.with_global_row_number_salted(
            skew_df, [("v", "asc"), ("id", "asc")], out="rn", n_buckets=8
        )
    finally:
        ranks._SALTED_BUCKET_PROBE = None
    hist = probe[0]
    n_hot = skew_df.filter("v = 42.0").count()
    assert len(hist) > 4
    assert max(hist.values()) < 0.5 * n_hot
