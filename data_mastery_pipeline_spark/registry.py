"""Query registry: named Spark queries + their DuckDB oracle SQL.

Shared by queries.py (core SURVEY §2 operators) and queries_ext.py
(LLM-data-pipeline extensions); __spark_entry__ re-exports the maps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, oracle_sql) pair."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def quantize(col, alias: str, decimals: int = 2):
    """Quantize a double engine-agnostically: floor(x*10^d + 0.5)/10^d.

    ``round(x, d)`` diverges between engines on decimal-boundary values
    (Spark rounds the full binary expansion via BigDecimal, DuckDB the
    shortest decimal repr: round(5.315, 2) → 5.31 vs 5.32). The floor
    form is pure IEEE-754 double arithmetic — bit-identical everywhere.
    The oracle twin is :func:`sql_quantize`.
    """
    m = 10**decimals
    return (F.floor(col * m + F.lit(0.5)) / float(m)).alias(alias)


def sql_quantize(expr: str, alias: str, decimals: int = 2) -> str:
    """Oracle-side twin of :func:`quantize`."""
    m = 10**decimals
    return f"floor(({expr}) * {m} + 0.5) / {m}.0 AS {alias}"
