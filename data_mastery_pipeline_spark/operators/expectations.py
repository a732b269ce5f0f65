"""Declarative data-quality expectation suites.

The reference's quality gate is a hand-rolled pair of checks
(quality_check.py:61-118: null-rate + range on two hardcoded columns,
each executed as its own count() action). This module is the engine
feature that pattern wants: a SUITE of named expectations declared as
data, compiled into the minimum number of Spark jobs —

- every row-level expectation (not-null, accepted-values, range,
  regex, custom predicate) folds into ONE aggregate pass over the
  table regardless of how many checks the suite carries;
- uniqueness compiles to a map-side-combined groupBy on the key
  (violations = Σ per-key (n−1), never a global distinct row set);
- referential integrity compiles to a LEFT ANTI join with the
  dimension side broadcast when small.

The result is a tiny (one row per expectation) relation —
(check_name, violations, passed) — suitable for gating a
write-audit-publish flow (wap.py) or alerting. Nothing here collects
to the driver; suites run as ordinary jobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowCheck:
    """A row-level expectation: ``violation`` is a boolean Column that
    is true exactly when the row FAILS the expectation. NULL evaluates
    as no-violation unless the predicate says otherwise — make the
    predicate explicit about NULLs (or add a not_null check)."""

    name: str
    violation: Column


def not_null(name: str, col: str) -> RowCheck:
    return RowCheck(name, F.col(col).isNull())


def accepted_values(name: str, col: str, values: list) -> RowCheck:
    c = F.col(col)
    return RowCheck(name, c.isNull() | ~c.isin(values))


def in_range(name: str, col: str, lo, hi) -> RowCheck:
    c = F.col(col)
    return RowCheck(name, c.isNull() | (c < lo) | (c > hi))


@dataclass(frozen=True)
class UniqueCheck:
    """Non-null values of ``cols`` must be unique; violations =
    Σ per-key (n−1). NULL keys are not this check's business
    (pair with not_null)."""

    name: str
    cols: tuple[str, ...]


@dataclass(frozen=True)
class ReferentialCheck:
    """Every (non-matching counts, including NULL keys) row of the fact
    must find its key in ``dim`` — violations = anti-join row count."""

    name: str
    cols: tuple[str, ...]
    dim: DataFrame = field(compare=False)
    dim_cols: tuple[str, ...] = ()
    broadcast_dim: bool = True


def run_suite(df: DataFrame, checks: list) -> DataFrame:
    """Execute a suite; returns (check_name, violations, passed),
    one row per expectation, in suite order (order by check_name for
    deterministic comparison)."""
    if not checks:
        raise ValueError("empty expectation suite")
    row_checks = [c for c in checks if isinstance(c, RowCheck)]
    parts: list[DataFrame] = []
    if row_checks:
        one = df.agg(
            *[
                F.sum(F.when(c.violation, 1).otherwise(0))
                .cast("long")
                .alias(f"v{i}")
                for i, c in enumerate(row_checks)
            ]
        )
        stack = ", ".join(
            f"'{c.name}', v{i}" for i, c in enumerate(row_checks)
        )
        parts.append(
            one.selectExpr(
                f"stack({len(row_checks)}, {stack}) "
                "AS (check_name, violations)"
            )
        )
    for c in checks:
        if isinstance(c, UniqueCheck):
            nn = df
            for col in c.cols:
                nn = nn.filter(F.col(col).isNotNull())
            dup = (
                nn.groupBy(*c.cols)
                .agg((F.count("*") - 1).alias("extra"))
                .agg(
                    F.coalesce(F.sum("extra"), F.lit(0))
                    .cast("long")
                    .alias("violations")
                )
            )
            parts.append(
                dup.select(F.lit(c.name).alias("check_name"), "violations")
            )
        elif isinstance(c, ReferentialCheck):
            dim_cols = c.dim_cols or c.cols
            dim = c.dim.select(
                *[
                    F.col(d).alias(f)
                    for f, d in zip(c.cols, dim_cols)
                ]
            ).dropDuplicates()
            if c.broadcast_dim:
                dim = F.broadcast(dim)
            orphans = df.join(dim, list(c.cols), "left_anti").agg(
                F.count("*").cast("long").alias("violations")
            )
            parts.append(
                orphans.select(
                    F.lit(c.name).alias("check_name"), "violations"
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0).orderBy(
        "check_name"
    )
