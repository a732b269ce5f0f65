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


# Footer-probe cache: (resolved file path, mtime) → "timestamp" | "nanos-long".
# Keyed on mtime so a driver-side testdata regeneration (which broke round 3:
# TIMESTAMP(NANOS) → timestamp[us]) invalidates the cache instead of serving
# a stale read plan.
_TS_KIND_CACHE: dict[tuple[str, float], str] = {}


def events_ts_kind(sf_dir: str = DEFAULT_SF_DIR) -> str:
    """Probe the events.parquet FOOTER (pyarrow — no Spark conf dependency,
    a Spark inference read of TIMESTAMP(NANOS) throws without nanosAsLong)
    and classify the physical type of ``ts``:

    - ``"timestamp"``: parquet TIMESTAMP(MICROS/MILLIS) — Spark reads it
      directly as TimestampType.
    - ``"nanos-long"``: TIMESTAMP(NANOS) or raw int64 epoch-nanos — Spark
      must read int64 (legacy.parquet.nanosAsLong) and floor-divide to µs.

    Anything else raises :class:`schemas.SchemaDriftError` loudly — the
    round-3 failure mode was exactly a silent misread after the physical
    type moved under an enforced schema.
    """
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):  # partitioned/dir layout: probe one data file
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        probe = parts[0] if parts else path
    else:
        probe = path
    key = (probe, os.path.getmtime(probe))
    if key not in _TS_KIND_CACHE:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_schema(probe).field("ts").type
        if pa.types.is_timestamp(t) and t.unit == "ns":
            kind = "nanos-long"
        elif pa.types.is_timestamp(t):
            kind = "timestamp"
        elif pa.types.is_integer(t):
            kind = "nanos-long"
        else:
            raise schemas.SchemaDriftError(
                f"events.ts physical type {t} is neither parquet TIMESTAMP "
                f"nor int64 — refusing to guess a conversion"
            )
        _TS_KIND_CACHE[key] = kind
    return _TS_KIND_CACHE[key]


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one testdata table with its registry schema enforced.

    ``events.ts`` physical handling is FOOTER-DRIVEN (see
    :func:`events_ts_kind`): parquet TIMESTAMP reads straight into
    TimestampType; TIMESTAMP(NANOS)/int64 reads as raw int64 nanos and
    floors to microseconds via integer division (``div``, never double
    division: ns epochs ≈ 1.7e18 exceed double's 53-bit mantissa),
    matching DuckDB's ns→µs truncation. Either way the surfaced schema
    is the registry ``EVENTS`` type.
    """
    if name == "events":
        path = f"{sf_dir}/{name}.parquet"
        if events_ts_kind(sf_dir) == "timestamp":
            return spark.read.schema(schemas.EVENTS).parquet(path)
        raw = spark.read.schema(schemas.EVENTS_RAW).parquet(path)
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

    ``events`` compares against whichever physical form the footer
    declares (``EVENTS`` for parquet TIMESTAMP, ``EVENTS_RAW`` for
    NANOS-as-long) — :func:`events_ts_kind` itself rejects any third
    form loudly.
    """
    from . import schemas as S

    observed = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    if name == "events":
        expected = (
            S.EVENTS if events_ts_kind(sf_dir) == "timestamp" else S.EVENTS_RAW
        )
    else:
        expected = S.TABLES[name]
    S.assert_schema_struct(observed, expected)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load the full star schema as a dict of DataFrames."""
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL entry point."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
