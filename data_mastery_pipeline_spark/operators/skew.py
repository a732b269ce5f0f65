"""Skew mitigation — salted aggregation & salted join (SURVEY §7 "100 TB
design discipline": salted keys for skew).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most runtime skew; these operators are the explicit
fallback for the cases AQE can't fix:

  - aggregation skew: one giant key (e.g. one hot user, null bucket)
    lands an entire groupBy partition on one task. Salting splits the
    hot key across `salt_buckets` tasks, then merges partials — two
    small shuffles instead of one stuck straggler.
  - join skew with a non-broadcastable build side: replicate the
    build side per salt bucket, spray the probe side — every bucket
    joins locally balanced.

Both preserve exact semantics (proved against the unsalted oracle in
the `salted_agg_value` contract query / tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

# Decompose each user-facing measure into (partial aggs, final merge
# expression). Algebraic measures merge trivially; avg must decompose to
# sum/count (averaging partial averages would weight buckets wrongly).
_PARTIAL = {
    "sum": lambda c: [("sum", c)],
    "count": lambda c: [("count", c)],
    "min": lambda c: [("min", c)],
    "max": lambda c: [("max", c)],
    "avg": lambda c: [("sum", c), ("count", c)],
}
_MERGE = {
    "sum": lambda p: F.sum(p[0]),
    "count": lambda p: F.sum(p[0]),
    "min": lambda p: F.min(p[0]),
    "max": lambda p: F.max(p[0]),
    "avg": lambda p: F.sum(p[0]) / F.sum(p[1]),
}


def content_salt(df: DataFrame, salt_buckets: int) -> Column:
    """THE salt expression salted_aggregate sprays with — exposed so the
    spreading test exercises the operator's own salt rather than an
    inline copy that can't regress with it (review r6). Content-hash of
    every column: attempt-stable under partial stage recompute (see
    salted_aggregate's docstring for the SPARK-23207 rationale)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    measures: Sequence[tuple[str, str, str]],  # (fn, col, alias)
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-proof aggregate: groupBy(keys + salt) partials,
    then groupBy(keys) merge. The salt never affects the result: stage 2
    merges all buckets of a key regardless of how rows were sprayed.

    The salt is the DETERMINISTIC row-content hash (review r6): the old
    monotonically_increasing_id() mix changed under partial stage
    recompute (row order within a re-run map partition differs between
    attempts), so after a shuffle-fetch failure reducers could combine
    old-attempt and new-attempt outputs with rows moved between salt
    buckets — the SPARK-23207 double-count/loss class. Content hashing
    is attempt-stable. The cost: a hot key of FULLY IDENTICAL rows
    (no unique column anywhere) re-collides onto one bucket — pre-
    aggregate exact duplicates first (exact_dedup/dup_groups) or add a
    genuinely unique column upstream; every table in this repo carries
    one."""
    salted = df.withColumn("__salt", content_salt(df, salt_buckets))

    partial_aggs: dict[str, Column] = {}  # name -> agg expr (deduped)
    partial_names: dict[tuple[str, str], list[str]] = {}
    for fn, col, _alias in measures:
        names = []
        for pfn, pcol in _PARTIAL[fn](col):
            # "*" (count rows, nulls included — COUNT(*) semantics) needs
            # a parse-safe partial column name (review r6: count("value")
            # was substituted for count(*) and silently skipped nulls)
            name = f"__p_{pfn}_{'star' if pcol == '*' else pcol}"
            partial_aggs.setdefault(name, getattr(F, pfn)(pcol).alias(name))
            names.append(name)
        partial_names[(fn, col)] = names

    stage1 = salted.groupBy(*keys, "__salt").agg(*partial_aggs.values())
    final = [
        _MERGE[fn](partial_names[(fn, col)]).alias(alias) for fn, col, alias in measures
    ]
    return stage1.groupBy(*keys).agg(*final)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof equi join without broadcast: EXPLODE the build side
    into every salt bucket (size × salt_buckets — acceptable when build
    is the smaller-but-not-broadcastable side), salt the probe side by
    row hash, join on (keys + salt). A hot probe key now spreads over
    `salt_buckets` tasks instead of one.

    Only probe-side-preserving joins are legal: with right/full outer
    joins every unmatched BUILD row would surface once per salt bucket
    (it was replicated into all of them), yielding salt_buckets
    null-padded duplicates — so those modes are rejected. Flip the
    arguments to express a right-outer as a left-outer.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched build rows "
            f"once per salt bucket; use one of {sorted(allowed)} "
            "(swap sides to express right-outer as left-outer)"
        )
    on = list(on)
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    build_rep = build.withColumn("__salt", F.explode(buckets))
    probe_salt = probe.withColumn(
        "__salt",
        # deterministic content hash — attempt-stable under partial
        # stage recompute (see salted_aggregate, review r6)
        F.pmod(
            F.xxhash64(*[F.col(c) for c in probe.columns]),
            F.lit(salt_buckets),
        ),
    )
    return probe_salt.join(build_rep, on=on + ["__salt"], how=how).drop("__salt")
