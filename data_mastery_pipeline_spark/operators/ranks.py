"""Distributed global ordering: exact row_number / ntile / prefix sums
with NO unpartitioned window anywhere in the plan.

`Window.orderBy(...)` without a partitionBy moves every row to one
task — Spark itself warns "Moving all data to a single partition" — and
at 100 TB that single task IS the job. Yet global ranks, quantile
buckets, and rank statistics are core analytics. This module computes
them exactly with the classic two-pass distributed prefix-sum:

1. **Split points** for the primary (numeric) order key from
   `approxQuantile` — at most ``n_buckets - 1`` doubles collected to
   the driver (bounded by a config constant, never by data). The
   points only steer *balance*, not correctness: any split set yields
   exact results.
2. **Ordered bucket id** per row by literal comparisons against the
   split points — a pure Catalyst expression (deterministic, codegen),
   equal keys always share a bucket, bucket order == key order.
3. **Local window** partitioned by bucket (`Window.partitionBy(bucket)
   .orderBy(full key)`) for the within-bucket row_number / cumsum —
   a partitioned WindowExec, parallel across buckets.
4. **Bucket offsets** from per-bucket totals via a triangle self-join
   (``b.bucket < a.bucket``) — a P×P join over P rows; no window, no
   collect.
5. **Broadcast the offsets back**: ``global = offset + local``.

Exactness argument: equal primary keys share a bucket (comparisons are
a function of the key), buckets are totally ordered by key range, and
the within-bucket order is the caller's full sort spec — so the
concatenation bucket-major, local-order-minor IS the global order, and
adding the exclusive prefix of bucket row-counts converts local
positions to global ones. NULL primaries go to a dedicated first
bucket for ASC (Spark's NULLS FIRST default) / last bucket for DESC
(NULLS LAST default), preserving Spark's window ordering semantics.

Skew note: a single key heavier than ``rows/n_buckets`` makes one hot
bucket (equal keys cannot split in rank semantics); row_number callers
who don't need rank ties could sub-salt, not done here. The 100 TB
failure mode this kills is the 100%-in-one-task global window; a hot
bucket degrades toward it only in the degenerate all-one-key case.

Reference parity: the reference engine computes its ntile/rank
analytics single-node (pandas `rank`/`qcut` shapes); this is the
distributed re-expression with identical tie/tile semantics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "__rk_bucket"
_LOC = "__rk_local"
_OFF = "__rk_off"
_TOT = "__rk_total"
_CNT = "__rk_cnt"


def _n_buckets(df: DataFrame, n_buckets: int | None) -> int:
    if n_buckets is not None:
        return n_buckets
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def _order_exprs(order_by: list[tuple[str, str]]) -> list[Column]:
    out = []
    for name, direction in order_by:
        c = F.col(name)
        out.append(c.desc() if direction == "desc" else c.asc())
    return out


def _with_ordered_buckets(
    df: DataFrame, order_by: list[tuple[str, str]], n_buckets: int | None
) -> DataFrame:
    """Append ``__rk_bucket``: an int ordered identically to the global
    sort order of ``order_by`` (primary key only; ties on the primary
    stay in one bucket). Runs one `approxQuantile` pass (a sketch
    aggregate — a scan, not a sort) to pick balance-only split points.
    """
    key, direction = order_by[0]
    desc = direction == "desc"
    p = _n_buckets(df, n_buckets)
    # bucket on a sign-adjusted double so DESC reuses the ASC machinery
    keyed = df.withColumn(
        _B + "_k",
        (-F.col(key) if desc else F.col(key)).cast("double"),
    )
    probs = [i / p for i in range(1, p)]
    # NaN-free split points: approxQuantile can return NaN when the
    # column holds NaNs; a NaN split is a dead comparison and breaks
    # sorted() portability.
    splits = sorted(
        {
            s
            for s in keyed.approxQuantile(_B + "_k", probs, 0.01)
            if s == s  # not NaN
        }
    )
    non_null = (
        reduce(
            lambda acc, s: acc
            + F.when(F.col(_B + "_k") > F.lit(s), 1).otherwise(0),
            splits,
            F.lit(1),
        )
        if splits
        else F.lit(1)
    )
    # NULL keys: ASC → before everything (bucket 0, matching Spark's
    # NULLS FIRST); DESC → after everything (last bucket, NULLS LAST).
    # NaN keys: Spark sorts NaN GREATER than every value, so NaN rows
    # go last under ASC (bucket len+2, free there) and FIRST under
    # DESC (bucket 0, free there) — the sign-flip trick can't route
    # them (-NaN is still NaN, and NaN > split is true for every
    # split, which would drop DESC NaNs into the last value bucket).
    null_bucket = F.lit(len(splits) + 2) if desc else F.lit(0)
    nan_bucket = F.lit(0) if desc else F.lit(len(splits) + 2)
    return keyed.withColumn(
        _B,
        F.when(F.col(_B + "_k").isNull(), null_bucket)
        .when(F.isnan(_B + "_k"), nan_bucket)
        .otherwise(non_null),
    ).drop(_B + "_k")


def _offsets(d: DataFrame, weight: Column) -> DataFrame:
    """(bucket, exclusive-prefix offset, grand total) from per-bucket
    totals: triangle self-join over ≤n_buckets rows — no window."""
    totals = d.groupBy(_B).agg(F.sum(weight).alias(_CNT))
    a, b = totals.alias("a"), totals.alias("b")
    off = (
        a.join(b, F.col("b." + _B) < F.col("a." + _B), "left")
        .groupBy(F.col("a." + _B).alias(_B), F.col("a." + _CNT))
        .agg(F.coalesce(F.sum("b." + _CNT), F.lit(0)).alias(_OFF))
    )
    grand = totals.agg(F.sum(_CNT).alias(_TOT))
    return off.crossJoin(F.broadcast(grand)).select(_B, _OFF, _TOT)


def with_global_row_number(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    out: str = "rn",
    n_buckets: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY ...)`` — exact, distributed.

    ``order_by``: ``[(col, 'asc'|'desc'), ...]``; the first key must be
    numeric (it steers the bucketing); the rest break ties. As with the
    window form, a non-total order gives nondeterministic numbers —
    pass a unique tie-break."""
    d = _with_ordered_buckets(df, order_by, n_buckets)
    offs = _offsets(d, F.lit(1))  # from the pre-window frame: the
    # totals branch re-reads the bucketed scan, not the sorted window
    w = Window.partitionBy(_B).orderBy(*_order_exprs(order_by))
    return (
        d.withColumn(_LOC, F.row_number().over(w))
        .join(F.broadcast(offs), _B, "left")
        .withColumn(out, (F.col(_OFF) + F.col(_LOC)).cast("long"))
        .drop(_B, _LOC, _OFF, _TOT)
    )


def with_global_row_number_salted(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    out: str = "rn",
    n_buckets: int | None = None,
) -> DataFrame:
    """``row_number`` for callers that do NOT need rank-tie bucketing
    — the skew-hardened variant the module header's hot-bucket caveat
    promises. ``order_by`` must be exactly ``[(key, dir), (tie, dir)]``
    with ``tie`` unique (the total order row_number needs anyway).

    `with_global_row_number` keeps equal keys in ONE bucket (rank
    semantics require it), so a key heavier than rows/n_buckets makes
    one hot window task. Here equal-key rows MAY split across buckets,
    sub-bucketed by tie-break ranges: a hot key's rows are ordered
    among themselves purely by the tie, so slicing them at tie split
    points preserves the global (key, tie) order exactly. Hot keys are
    detected from DUPLICATE approxQuantile split points (a value
    holding ≥ ~2/n_buckets of the mass repeats in the quantile list) —
    detection is balance-only: a missed hot key degrades parallelism,
    never correctness. Output is IDENTICAL to the unsalted form (the
    total order makes the numbering unique)."""
    if len(order_by) != 2:
        raise ValueError(
            "salted row_number needs exactly [(key, dir), (tie, dir)]"
        )
    (key, kdir), (tie, tdir) = order_by
    kdesc, tdesc = kdir == "desc", tdir == "desc"
    p = _n_buckets(df, n_buckets)
    kd, td = _B + "_k", _B + "_t"
    keyed = df.withColumn(
        kd, (-F.col(key) if kdesc else F.col(key)).cast("double")
    ).withColumn(
        td, (-F.col(tie) if tdesc else F.col(tie)).cast("double")
    )
    probs = [i / p for i in range(1, p)]
    qs = [s for s in keyed.approxQuantile(kd, probs, 0.01) if s == s]
    splits = sorted(set(qs))
    hot = sorted({v for v in splits if qs.count(v) >= 2})
    tie_splits = sorted(
        {s for s in keyed.approxQuantile(td, probs, 0.01) if s == s}
    )
    ts_n = len(tie_splits)
    base = (
        reduce(
            lambda acc, s: acc
            + F.when(F.col(kd) > F.lit(s), 1).otherwise(0),
            splits,
            F.lit(1),
        )
        if splits
        else F.lit(1)
    )
    null_bucket = F.lit(len(splits) + 2) if kdesc else F.lit(0)
    nan_bucket = F.lit(0) if kdesc else F.lit(len(splits) + 2)
    base = (
        F.when(F.col(kd).isNull(), null_bucket)
        .when(F.isnan(kd), nan_bucket)
        .otherwise(base)
    )
    # sub-bucket: 0 for non-hot rows (they share their base bucket's
    # window); hot-key rows slice by tie range into 2..ts_n+2, with
    # NULL/NaN ties routed to the extreme sub matching Spark's sort
    # position for the ORIGINAL tie direction (NULLS FIRST under ASC /
    # LAST under DESC; NaN greatest → last under ASC, first under DESC)
    tie_rank = reduce(
        lambda acc, s: acc + F.when(F.col(td) > F.lit(s), 1).otherwise(0),
        tie_splits,
        F.lit(2),
    )
    null_sub = F.lit(1) if not tdesc else F.lit(ts_n + 3)
    nan_sub = F.lit(ts_n + 3) if not tdesc else F.lit(1)
    sub = F.when(
        F.col(kd).isin([float(v) for v in hot]) if hot else F.lit(False),
        F.when(F.col(td).isNull(), null_sub)
        .when(F.isnan(td), nan_sub)
        .otherwise(tie_rank),
    ).otherwise(F.lit(0))
    # composite id: lexicographic (base, sub) flattened — valid because
    # a hot value is always the MAX key of its base bucket (it is a
    # split point, and rows sort into the bucket counting splits
    # strictly below them), so sub>0 rows order after their bucket's
    # sub=0 rows in (key, tie) order
    width = ts_n + 4
    d = keyed.withColumn(_B, base * width + sub).drop(kd, td)
    if _SALTED_BUCKET_PROBE is not None:
        _SALTED_BUCKET_PROBE.append(
            {
                r[_B]: r["n"]
                for r in d.groupBy(_B).agg(F.count("*").alias("n")).collect()
            }
        )
    offs = _offsets(d, F.lit(1))
    w = Window.partitionBy(_B).orderBy(*_order_exprs(order_by))
    return (
        d.withColumn(_LOC, F.row_number().over(w))
        .join(F.broadcast(offs), _B, "left")
        .withColumn(out, (F.col(_OFF) + F.col(_LOC)).cast("long"))
        .drop(_B, _LOC, _OFF, _TOT)
    )


# tests / tools/scale_probe.py set this to a list to capture the
# composite-bucket histogram of the next salted call (an extra count
# job — never enabled in production paths)
_SALTED_BUCKET_PROBE: list | None = None


def exact_ntile(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    n: int,
    out: str = "tile",
    n_buckets: int | None = None,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY ...)`` — exact SQL-standard semantics
    (first ``N mod n`` tiles get one extra row), distributed.

    Derivation from the global row number rn and total N with
    ``b = N div n``, ``r = N mod n``: rows ``rn ≤ r·(b+1)`` fall in
    tile ``ceil(rn/(b+1))``; the rest in ``r + ceil((rn−r·(b+1))/b)``.
    """
    d = _with_ordered_buckets(df, order_by, n_buckets)
    offs = _offsets(d, F.lit(1))
    w = Window.partitionBy(_B).orderBy(*_order_exprs(order_by))
    d = d.withColumn(_LOC, F.row_number().over(w)).join(
        F.broadcast(offs), _B, "left"
    )
    rn = F.col(_OFF) + F.col(_LOC)
    big = F.floor(F.col(_TOT) / F.lit(n)).cast("long")
    rem = F.col(_TOT) % n
    in_big = rn <= rem * (big + 1)
    tile = F.when(in_big, F.ceil(rn / (big + 1))).otherwise(
        rem + F.ceil((rn - rem * (big + 1)) / big)
    )
    return d.withColumn(out, tile.cast("int")).drop(_B, _LOC, _OFF, _TOT)


def with_prefix_sums(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    weights: list[str],
    outs: list[str],
    inclusive: bool = True,
    n_buckets: int | None = None,
) -> DataFrame:
    """Several running sums over ONE ordering in ONE bucketing pass:
    one approxQuantile sketch, one bucket-partitioned window stage,
    one triangle-offset join computing every weight's per-bucket
    offsets together — k statistics for ~the cost of one (the KS test
    needs both sample ECDFs on the same value order)."""
    if len(weights) != len(outs):
        raise ValueError("weights and outs must pair up")
    d = _with_ordered_buckets(df, order_by, n_buckets)
    totals = d.groupBy(_B).agg(
        *[F.sum(w).alias(f"{_CNT}_{i}") for i, w in enumerate(weights)]
    )
    a, b = totals.alias("a"), totals.alias("b")
    off = (
        a.join(b, F.col("b." + _B) < F.col("a." + _B), "left")
        .groupBy(F.col("a." + _B).alias(_B))
        .agg(
            *[
                F.coalesce(F.sum(f"b.{_CNT}_{i}"), F.lit(0)).alias(
                    f"{_OFF}_{i}"
                )
                for i in range(len(weights))
            ]
        )
    )
    w_loc = (
        Window.partitionBy(_B)
        .orderBy(*_order_exprs(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for i, (wcol, out) in enumerate(zip(weights, outs)):
        d = d.withColumn(f"{_LOC}_{i}", F.sum(wcol).over(w_loc))
    d = d.join(F.broadcast(off), _B, "left")
    for i, (wcol, out) in enumerate(zip(weights, outs)):
        local = F.col(f"{_LOC}_{i}")
        if not inclusive:
            local = local - F.col(wcol)
        d = d.withColumn(out, F.col(f"{_OFF}_{i}") + local).drop(
            f"{_LOC}_{i}", f"{_OFF}_{i}"
        )
    return d.drop(_B)


def with_prefix_sum(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    weight: str,
    out: str = "cum",
    inclusive: bool = True,
    n_buckets: int | None = None,
) -> DataFrame:
    """``sum(weight) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` —
    the running sum, distributed. ``inclusive=False`` excludes the
    current row (the form rank statistics need: ``rank_min = 1 +``
    exclusive prefix of tie-group counts over the *distinct-value*
    relation)."""
    d = _with_ordered_buckets(df, order_by, n_buckets)
    offs = _offsets(d, F.col(weight))
    w = (
        Window.partitionBy(_B)
        .orderBy(*_order_exprs(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn(_LOC, F.sum(weight).over(w))
    local = F.col(_LOC) if inclusive else F.col(_LOC) - F.col(weight)
    return (
        d.join(F.broadcast(offs), _B, "left")
        .withColumn(out, F.col(_OFF) + local)
        .drop(_B, _LOC, _OFF, _TOT)
    )
