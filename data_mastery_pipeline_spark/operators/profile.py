"""Column profiling — the `DESCRIBE`-on-steroids every engine grows.

One row per column: row/null/distinct counts plus min/max (stringified
so heterogeneous column types stack into one long-form frame). The
whole profile is ONE aggregate pass computing every column's statistics
side by side (all map-side combinable), then a driver-free unpivot of
the single result row into long form — never one job per column, which
is the naive implementation's O(columns) scans.

At 100 TB: the scan reads every profiled column once; distinct counts
are the heavy accumulators — swap ``exact=False`` for HLL
(approx_count_distinct, rsd 0.01) to keep the aggregation buffers
O(1) per column, same trade as distinct_users_approx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Long-form profile: (column, dtype, n_rows, n_null, n_distinct,
    min_value, max_value) per profiled column, ordered by column name.

    ``n_distinct`` ignores NULLs (count(DISTINCT col) semantics);
    min/max are rendered as strings for a uniform schema.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c, 0.01))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            # coalesce: sum over ZERO rows is null, but "no rows" means
            # zero nulls, not unknown
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0).cast("long")
            ).alias(f"__null_{c}"),
            distinct(c).alias(f"__dist_{c}"),
            # aggregate on the NATIVE type, cast the result — casting
            # first would make numeric min/max lexicographic ('9' > '14')
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("column")
    )


def fd_audit(
    df: DataFrame,
    keys: list[tuple[str, ...]],
    fds: list[tuple[tuple[str, ...], str]],
) -> DataFrame:
    """Candidate-key and functional-dependency audit — the profiling
    step schema-discovery and data-contract tools run before trusting
    a key for a merge or a dimension join (public FD-discovery
    literature: TANE/HyFD verify exactly these count-distinct
    identities; this is the declarative verification half, not the
    combinatorial search).

    ``keys``: column tuples to test for key-ness — a tuple is a key
    iff count(DISTINCT cols) == count(*) (and no NULLs, which the
    count-distinct identity subsumes only when callers audit NULL-free
    columns — pair with :func:`profile`'s null counts).
    ``fds``: (lhs columns, rhs column) pairs — lhs → rhs holds iff
    count(DISTINCT lhs+rhs) == count(DISTINCT lhs).

    Output: one row per check —
    ``(check_name, n_groups, n_distinct, holds)`` where for keys n_groups =
    total rows / n_distinct = distinct key tuples, and for FDs
    n_groups = distinct lhs / n_distinct = distinct (lhs, rhs) combos
    (their difference counts the violating lhs-value surplus).

    Scale: ONE aggregate pass over the scan — every check is a
    count-distinct in the same Aggregate (Catalyst expands distinct
    aggregates; at extreme widths swap approx_count_distinct for the
    same identities within rsd, the profile() trade). No per-check
    jobs, no collect beyond the single result row inlined as literals
    into a unioned one-row-per-check relation.
    """
    aggs = [F.count("*").alias("__n")]
    for i, cols in enumerate(keys):
        aggs.append(F.countDistinct(*cols).alias(f"__k{i}"))
    for j, (lhs, rhs) in enumerate(fds):
        aggs.append(F.countDistinct(*lhs).alias(f"__l{j}"))
        aggs.append(
            F.countDistinct(*(list(lhs) + [rhs])).alias(f"__p{j}")
        )
    one = df.agg(*aggs)
    # unpivot the single counter row with stack(): ONE execution of the
    # aggregate feeding every check row lazily (a union of per-check
    # selects would re-run the scan once per check)
    tuples = []
    for i, cols in enumerate(keys):
        name = "key:" + ",".join(cols)
        tuples.append(
            f"'{name}', CAST(__n AS BIGINT), CAST(__k{i} AS BIGINT), "
            f"__k{i} = __n"
        )
    for j, (lhs, rhs) in enumerate(fds):
        name = "fd:" + ",".join(lhs) + "->" + rhs
        tuples.append(
            f"'{name}', CAST(__l{j} AS BIGINT), CAST(__p{j} AS BIGINT), "
            f"__p{j} = __l{j}"
        )
    n = len(tuples)
    return one.selectExpr(
        f"stack({n}, {', '.join(tuples)}) "
        "AS (check_name, n_groups, n_distinct, holds)"
    )
