"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_mastery_pipeline_spark`` — this module only
re-exports the registry (data_mastery_pipeline_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import data_mastery_pipeline_spark.queries  # noqa: F401  (registers core queries)
import data_mastery_pipeline_spark.queries_ext  # noqa: F401  (registers extension queries)
import data_mastery_pipeline_spark.queries_src  # noqa: F401  (registers source/sink queries)
import data_mastery_pipeline_spark.queries_stream  # noqa: F401  (registers streaming queries)
from data_mastery_pipeline_spark.registry import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary — the generalized form of the
    reference's daily aggregate A1 (silver_processor.py:279-290).
    """
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return dict(ORACLE)
