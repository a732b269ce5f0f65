"""Testdata table loaders — schema-enforced parquet scans (SURVEY §2 S9).

The reference never infers schemas for Spark reads (silver_processor.py:
144-146 applies a declared StructType); we do the same for every table.
Enforced schemas also guarantee the scan's ReadSchema is exactly the
registry type, so column pruning and filter pushdown behave predictably.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one testdata table with its registry schema enforced.

    ``events.ts`` is TIMESTAMP(NANOS) parquet — read as int64 nanos
    (legacy.parquet.nanosAsLong) and floored to microseconds via integer
    division (``div``, never double division: ns epochs ≈ 1.7e18 exceed
    double's 53-bit mantissa), matching DuckDB's ns→µs truncation.
    """
    if name == "events":
        raw = spark.read.schema(schemas.EVENTS_RAW).parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    schema = schemas.TABLES[name]
    return spark.read.schema(schema).parquet(f"{sf_dir}/{name}.parquet")


def check_drift(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Schema-drift probe (SURVEY §1.3; reference config.yaml:109): read
    the table's FOOTER schema (inference, no data scan) and diff it
    against the registry. `load_table`'s enforced-schema read would
    silently coerce or null out drifted columns — this check makes
    drift loud instead. Run it per batch before processing.

    ``events`` is exempt from type comparison on ``ts`` (stored
    TIMESTAMP(NANOS), surfaced as µs — see load_table).
    """
    from . import schemas as S

    observed = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    expected = S.EVENTS_RAW if name == "events" else S.TABLES[name]
    S.assert_schema_struct(observed, expected)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load the full star schema as a dict of DataFrames."""
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL entry point."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
