"""Live PostgreSQL serving round-trip (S12/S13 against a real server).

The container ships a PostgreSQL server (no JDBC jar, no Python client
package), so these tests drive the repo's own wire-protocol client
(sources/pgwire.py) through the Python Data Source API
(sources/pgserving.py): executor-side partitioned reads, COPY bulk
loads, and the gold_loader keyed-upsert idempotency contract
(gold_loader.py:296-319 + UNIQUE index sql/schema.sql:86)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from conftest import SF_ORACLE

from data_mastery_pipeline_spark.sources import pgserving, pgwire
from data_mastery_pipeline_spark.tables import load_table


@pytest.fixture(scope="module")
def pg(spark):
    if not pgserving.ensure_local_server():
        pytest.skip("no local PostgreSQL server available")
    pgserving.register(spark)
    conn = pgwire.PGConnection(port=pgserving.LOCAL_PORT, database="serving")
    yield conn
    conn.close()


def test_wire_client_types_and_errors(pg):
    r = pg.query(
        "SELECT 1::bigint AS i, 'a''b' AS s, 2.5::float8 AS f, "
        "true AS b, NULL::text AS n, TIMESTAMP '2026-01-02 03:04:05.123456' AS t"
    )
    assert r.rows == [(1, "a'b", 2.5, True, None, datetime(2026, 1, 2, 3, 4, 5, 123456))]
    with pytest.raises(pgwire.PGError) as ei:
        pg.query("SELECT * FROM no_such_table")
    assert ei.value.fields["C"] == "42P01"  # undefined_table
    assert pg.query("SELECT 42").rows == [(42,)]  # connection survives errors


def test_copy_and_partitioned_read_roundtrip(spark, pg):
    """Gold daily aggregate → COPY load → 4-slice partitioned read back:
    values identical, work spread across range partitions, NULLs kept."""
    ev = load_table(spark, "events", SF_ORACLE)
    gold = (
        ev.groupBy(F.col("user_id").alias("uid"))
        .agg(
            F.count("*").alias("n_events"),
            F.floor(F.sum("value") * 10000 + 0.5).alias("sum_value_e4"),
        )
        # a NULL partition-column row must survive the round trip
        .unionByName(
            spark.createDataFrame(
                [(None, 0, 0)], "uid long, n_events long, sum_value_e4 long"
            )
        )
    )
    pg.execute("DROP TABLE IF EXISTS gold_user_stats")
    pgserving.ensure_serving_table(pg, "gold_user_stats", gold.schema)
    pgserving.write_serving_table(
        gold, "gold_user_stats", port=pgserving.LOCAL_PORT, database="serving",
        num_partitions=4,
    )

    lo, hi = 0, gold.agg(F.max("uid")).collect()[0][0] + 1
    back = pgserving.read_serving_table(
        spark, "gold_user_stats", port=pgserving.LOCAL_PORT, database="serving",
        partition_column="uid", lower_bound=lo, upper_bound=hi, num_partitions=4,
    )
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    assert sorted(map(tuple, back.collect()), key=key) == sorted(
        map(tuple, gold.collect()), key=key
    )
    # the scan really ran as parallel range slices
    n_slices = back.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_slices == 4


def test_upsert_is_idempotent_and_updates(spark, pg):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, k string, v double"
    )
    pg.execute("DROP TABLE IF EXISTS serving_upsert")
    pgserving.ensure_serving_table(pg, "serving_upsert", df.schema, key_cols=["id"])

    kw = dict(port=pgserving.LOCAL_PORT, database="serving", upsert_keys=["id"])
    pgserving.write_serving_table(df, "serving_upsert", **kw)
    pgserving.write_serving_table(df, "serving_upsert", **kw)  # replay: no dupes
    assert pg.query("SELECT count(*) FROM serving_upsert").rows[0][0] == 3

    updated = spark.createDataFrame([(2, "B2", 20.0)], "id long, k string, v double")
    pgserving.write_serving_table(updated, "serving_upsert", **kw)
    got = pg.query("SELECT id, k, v FROM serving_upsert ORDER BY id").rows
    assert got == [(1, "a", 1.0), (2, "B2", 20.0), (3, "c", 3.0)]


def test_overwrite_mode_rejected(spark, pg):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(Exception, match="append/upsert"):
        (
            df.write.format("pg_serving")
            .mode("overwrite")
            .option("port", str(pgserving.LOCAL_PORT))
            .option("database", "serving")
            .option("table", "whatever")
            .save()
        )


# --- wire-protocol encoding properties ------------------------------------


from hypothesis import HealthCheck, given, settings as hy_settings
from hypothesis import strategies as st

_WIRE_SET = hy_settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish unicode plus every character the COPY/literal encoders
# must escape (tab, newline, CR, backslash, quote) and NULs are rejected
# by PG text columns, so exclude only \x00
_TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00"
    ),
    max_size=80,
)


@_WIRE_SET
@given(s=_TEXT, v=st.one_of(st.none(), st.floats(allow_nan=False, width=64)))
def test_copy_roundtrip_preserves_arbitrary_text(pg, s, v):
    """COPY text-format escaping: whatever goes in comes back verbatim
    through the real server (tabs, newlines, backslashes, unicode)."""
    pg.execute(
        "DROP TABLE IF EXISTS wire_prop; "
        "CREATE TABLE wire_prop(id int, s text, v double precision)"
    )
    pg.copy_rows("wire_prop", ["id", "s", "v"], [(1, s, v)])
    got = pg.query("SELECT s, v FROM wire_prop").rows[0]
    assert got[0] == s
    assert got[1] == v or (v is not None and abs(got[1] - v) < 1e-307)


@_WIRE_SET
@given(s=_TEXT)
def test_quote_literal_roundtrip(pg, s):
    """INSERT-literal quoting: server parses our literal back to the
    exact original string (quote doubling, no backslash surprises)."""
    got = pg.query(f"SELECT {pgwire.quote_literal(s)}").rows[0][0]
    assert got == s


def test_upsert_batch_with_duplicate_keys_keeps_last(spark, pg):
    """Review r6: duplicate keys within ONE statement would raise
    Postgres error 21000 ('cannot affect row a second time'); the
    writer dedups per statement, last occurrence winning — the
    at-least-once replay case the idempotent load exists for."""
    pg.execute(
        "DROP TABLE IF EXISTS dup_batch;"
        "CREATE TABLE dup_batch (k BIGINT, v DOUBLE PRECISION,"
        " CONSTRAINT dup_batch_k UNIQUE (k))"
    )
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (1, 10.0), (1, 100.0)], "k bigint, v double"
    ).coalesce(1)  # same task → same statement
    (
        df.write.format("pg_serving")
        .option("port", pgserving.LOCAL_PORT)
        .option("database", "serving")
        .option("table", "dup_batch")
        .option("upsert_keys", "k")
        .mode("append")
        .save()
    )
    got = dict(pg.query("SELECT k, v FROM dup_batch ORDER BY k").rows)
    assert got == {1: 100.0, 2: 2.0}


def test_timestamptz_parse_any_offset_and_nan_literals(pg):
    """Review r6: non-UTC offsets crashed _parse_value; NaN/Infinity
    rendered as invalid bare tokens."""
    r = pg.query("SELECT TIMESTAMPTZ '2024-06-01 12:00:00-05'").rows[0][0]
    assert r == datetime(2024, 6, 1, 17, 0, 0)  # normalized to UTC
    row = pg.query(
        f"SELECT {pgwire.quote_literal(float('nan'))},"
        f" {pgwire.quote_literal(float('inf'))}"
    ).rows[0]
    assert row[0] != row[0] and row[1] == float("inf")


def test_query_iter_streams_rows(pg):
    pg.execute(
        "DROP TABLE IF EXISTS strm;"
        "CREATE TABLE strm AS SELECT g AS x FROM generate_series(1, 500) g"
    )
    it = pg.query_iter("SELECT x FROM strm ORDER BY x")
    first = next(it)
    assert first == (1,)
    rest = list(it)
    assert len(rest) == 499 and rest[-1] == (500,)
    # connection still usable after full drain
    assert pg.query("SELECT 1").rows == [(1,)]
