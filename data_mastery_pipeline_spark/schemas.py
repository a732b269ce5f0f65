"""Schema registry — single source of truth for every dataset schema.

The reference declares its input schema three separate times by hand
(dataclass weather_producer.py:24-48, StructType silver_processor.py:67-89,
DDL schema.sql:15-78) and keeps them consistent manually; SURVEY §1.3 calls
for one registry with enforcement on read. Schemas here are *enforced*
(``spark.read.schema(...)``) — never inferred — and drift detection is a
first-class check (:func:`assert_schema`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# --- testdata star schema (TESTDATA.md / FIXTURES.md §3) -------------------

REGION = T.StructType([_f("r_regionkey", T.IntegerType()), _f("r_name", T.StringType())])

NATION = T.StructType(
    [
        _f("n_nationkey", T.IntegerType()),
        _f("n_name", T.StringType()),
        _f("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        _f("c_custkey", T.LongType()),
        _f("c_name", T.StringType()),
        _f("c_nationkey", T.IntegerType()),
        _f("c_acctbal", T.DoubleType()),
        _f("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        _f("s_suppkey", T.LongType()),
        _f("s_name", T.StringType()),
        _f("s_nationkey", T.IntegerType()),
        _f("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        _f("p_partkey", T.LongType()),
        _f("p_name", T.StringType()),
        _f("p_brand", T.StringType()),
        _f("p_type", T.StringType()),
        _f("p_size", T.IntegerType()),
        _f("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        _f("o_orderkey", T.LongType()),
        _f("o_custkey", T.LongType()),
        _f("o_orderstatus", T.StringType()),
        _f("o_totalprice", T.DoubleType()),
        _f("o_orderdate", T.TimestampType()),
        _f("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        _f("l_orderkey", T.LongType()),
        _f("l_partkey", T.LongType()),
        _f("l_suppkey", T.LongType()),
        _f("l_linenumber", T.IntegerType()),
        _f("l_quantity", T.DoubleType()),
        _f("l_extendedprice", T.DoubleType()),
        _f("l_discount", T.DoubleType()),
        _f("l_tax", T.DoubleType()),
        _f("l_returnflag", T.StringType()),
        _f("l_linestatus", T.StringType()),
        _f("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        _f("event_id", T.LongType()),
        _f("ts", T.TimestampType()),
        _f("user_id", T.LongType()),
        _f("event_type", T.StringType()),
        _f("value", T.DoubleType()),
        _f("props", T.StringType()),  # JSON payload, parsed with from_json
    ]
)

# On-disk twin of EVENTS for the TIMESTAMP(NANOS)/int64 physical form,
# which Spark's reader rejects as TimestampType; it is read as raw int64
# nanoseconds (spark.sql.legacy.parquet.nanosAsLong) and converted in
# tables.load_table. Which form a file uses is probed from the parquet
# footer at read time (tables.events_ts_kind) — the testdata generator
# has shipped BOTH forms across rounds, so neither is assumed.
EVENTS_RAW = T.StructType(
    [
        _f("event_id", T.LongType()),
        _f("ts", T.LongType()),
        _f("user_id", T.LongType()),
        _f("event_type", T.StringType()),
        _f("value", T.DoubleType()),
        _f("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        _f("doc_id", T.LongType()),
        _f("text", T.StringType()),
        _f("lang", T.StringType()),
        _f("source", T.StringType()),
        _f("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        _f("vec_id", T.LongType()),
        _f("embedding", T.ArrayType(T.FloatType())),
        _f("label", T.IntegerType()),
    ]
)

# Schema of events.props JSON payloads (F2 — from_json target).
# Testdata payloads are {"k": <int>}; the registry keeps the parse target
# declared rather than inferred, same discipline as the table schemas.
EVENT_PROPS = T.StructType([_f("k", T.LongType())])

# --- the reference's canonical input record (FIXTURES.md §1) ---------------
# 21 fields: 18 observation fields + 3 Kafka metadata columns
# (reference silver_processor.py:61-89, kafka_consumer_s3.py:213-217).

WEATHER_BRONZE = T.StructType(
    [
        _f("city", T.StringType()),
        _f("country", T.StringType()),
        _f("timestamp", T.StringType()),  # ISO-8601; cast downstream (P1)
        _f("temperature", T.DoubleType()),
        _f("feels_like", T.DoubleType()),
        _f("temp_min", T.DoubleType()),
        _f("temp_max", T.DoubleType()),
        _f("pressure", T.IntegerType()),
        _f("humidity", T.IntegerType()),
        _f("visibility", T.IntegerType()),
        _f("wind_speed", T.DoubleType()),
        _f("wind_deg", T.IntegerType()),
        _f("clouds", T.IntegerType()),
        _f("weather_main", T.StringType()),
        _f("weather_description", T.StringType()),
        _f("sunrise", T.StringType()),
        _f("sunset", T.StringType()),
        _f("ingestion_timestamp", T.StringType()),
        _f("_kafka_partition", T.IntegerType()),
        _f("_kafka_offset", T.LongType()),
        _f("_kafka_timestamp", T.StringType()),
    ]
)

TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
    "weather_bronze": WEATHER_BRONZE,
}


class SchemaDriftError(ValueError):
    """A dataset's observed schema diverged from the registry."""


def assert_schema(df: DataFrame, expected: T.StructType) -> DataFrame:
    """Drift detection (reference config.yaml:109 `check_schema_changes`).

    Compares name+type (ignoring nullability, which parquet round-trips
    loosely) and raises :class:`SchemaDriftError` with a field-level diff.
    """
    assert_schema_struct(df.schema, expected)
    return df


def assert_schema_struct(got_schema: T.StructType, expected: T.StructType) -> None:
    """Struct-level form of :func:`assert_schema` (for footer schemas
    read without a DataFrame)."""
    got = {f.name: f.dataType.simpleString() for f in got_schema.fields}
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    if got != want:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        changed = sorted(k for k in set(got) & set(want) if got[k] != want[k])
        raise SchemaDriftError(
            f"schema drift: missing={missing} extra={extra} "
            f"changed={[(k, want[k], got[k]) for k in changed]}"
        )
