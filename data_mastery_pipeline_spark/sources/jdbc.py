"""JDBC serving sink / scan (SURVEY §2.A S12/S13).

The reference serves Gold tables by `df.write.jdbc` into Postgres
(gold_loader.py:265-271,298-304,335-341; connection props :199-207) and
reads back for quality checks. These wrappers reproduce that surface
with the scale knobs the reference leaves at defaults:

  - `batchsize` (reference: 1000, config/config.yaml:84) — rows per
    INSERT round-trip;
  - `numPartitions` on write — caps concurrent DB connections (every
    executor task opens one; 1000 executors × default parallelism would
    connection-storm the server);
  - partitioned reads (`partitionColumn/lowerBound/upperBound`) so a
    big serving table scans in parallel instead of one connection.

No JDBC driver jar ships in this container, so these calls fail fast
with a clear message; the option-building logic is what unit tests cover
(tests/test_sources.py). The LIVE serving path — same partitioned-read /
bounded-connection architecture against the container's real PostgreSQL
server — is pgserving.py (wire-protocol client + Python Data Source),
exercised end-to-end by tests/test_pgserving.py and the
`pg_serving_roundtrip` contract query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_url(host: str, port: int, database: str, dialect: str = "postgresql") -> str:
    return f"jdbc:{dialect}://{host}:{port}/{database}"


def connection_properties(
    user: str, password: str, dialect: str = "postgresql"
) -> dict[str, str]:
    driver = {
        "postgresql": "org.postgresql.Driver",
        "mysql": "com.mysql.cj.jdbc.Driver",
    }[dialect]
    return {"user": user, "password": password, "driver": driver}


def write_serving_table(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str],
    mode: str = "append",
    batchsize: int = 1000,
    num_partitions: int = 8,
) -> None:
    """Gold-table load: append under the serving key's UNIQUE constraint
    (idempotency itself is the anti-join upsert, operators.cleaning.
    idempotent_append — do the dedup in Spark, not by swallowing
    duplicate-key errors like gold_loader.py:313-319)."""
    (
        df.coalesce(num_partitions)
        .write.option("batchsize", str(batchsize))
        .jdbc(url, table, mode=mode, properties=properties)
    )


def read_serving_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str],
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Serving-side scan (quality checks / round-trip tests,
    weather_pipeline_dag.py:174-216). With bounds given, reads in
    `num_partitions` parallel range slices."""
    reader: DataFrameReader = spark.read
    if partition_column is not None:
        return reader.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=properties,
        )
    return reader.jdbc(url, table, properties=properties)
