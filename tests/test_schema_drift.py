"""Schema-drift detection (SURVEY §1.3): the registry is enforced on
read, and divergence between stored and declared schemas is loud."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark import schemas, tables

from conftest import SF_ORACLE


def test_all_testdata_tables_match_registry(spark):
    for name in tables.TABLE_NAMES:
        tables.check_drift(spark, name, SF_ORACLE)  # must not raise


def test_missing_column_detected(spark):
    df = tables.load_table(spark, "orders", SF_ORACLE).drop("o_totalprice")
    with pytest.raises(schemas.SchemaDriftError, match="missing=\\['o_totalprice'\\]"):
        schemas.assert_schema(df, schemas.ORDERS)


def test_extra_column_detected(spark):
    df = tables.load_table(spark, "orders", SF_ORACLE).withColumn("surprise", F.lit(1))
    with pytest.raises(schemas.SchemaDriftError, match="extra=\\['surprise'\\]"):
        schemas.assert_schema(df, schemas.ORDERS)


def test_type_change_detected(spark):
    df = tables.load_table(spark, "orders", SF_ORACLE).withColumn(
        "o_totalprice", F.col("o_totalprice").cast("string")
    )
    with pytest.raises(schemas.SchemaDriftError, match="changed="):
        schemas.assert_schema(df, schemas.ORDERS)


def test_matching_schema_passes_through(spark):
    df = tables.load_table(spark, "orders", SF_ORACLE)
    assert schemas.assert_schema(df, schemas.ORDERS) is df


# --- footer-driven events.ts physical-type tolerance (round-4 guard) -------
# Round 3's defining failure: the testdata generator switched events.ts from
# TIMESTAMP(NANOS) to timestamp[us] and the enforced int64 read silently
# produced 1970 timestamps. These tests pin BOTH physical forms to the same
# logical result, and pin the loud failure for any third form.


def _write_events(tmp_path, ts_array):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp_path.mkdir(parents=True, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"k":1}', '{"k":2}']),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_events_micros_and_nanos_forms_read_identically(spark, tmp_path):
    import pyarrow as pa

    micros = [1704067200_000000, 1704067260_500000]  # 2024-01-01 00:00/00:01
    d_us = _write_events(tmp_path / "us", pa.array(micros, pa.timestamp("us")))
    d_ns = _write_events(
        tmp_path / "ns", pa.array([m * 1000 for m in micros], pa.timestamp("ns"))
    )
    rows_us = sorted(tables.load_table(spark, "events", d_us).collect())
    rows_ns = sorted(tables.load_table(spark, "events", d_ns).collect())
    assert rows_us == rows_ns
    assert str(rows_us[0]["ts"].year) == "2024"
    assert tables.events_ts_kind(d_us) == "timestamp"
    assert tables.events_ts_kind(d_ns) == "nanos-long"


def test_events_unknown_ts_physical_type_is_loud(spark, tmp_path):
    import pyarrow as pa

    d = _write_events(tmp_path, pa.array(["2024-01-01", "2024-01-02"], pa.string()))
    with pytest.raises(schemas.SchemaDriftError, match="incompatible"):
        tables.load_table(spark, "events", d)


def test_events_kind_cache_invalidates_on_rewrite(spark, tmp_path):
    import os

    import pyarrow as pa

    micros = [1704067200_000000, 1704067260_500000]
    d = _write_events(tmp_path, pa.array(micros, pa.timestamp("us")))
    assert tables.events_ts_kind(d) == "timestamp"
    _write_events(
        tmp_path, pa.array([m * 1000 for m in micros], pa.timestamp("ns"))
    )
    os.utime(tmp_path / "events.parquet", (0, 9999999999))  # force mtime change
    assert tables.events_ts_kind(d) == "nanos-long"


def test_orders_timestamp_nanos_form_tolerated(spark, tmp_path):
    """The generalized footer tolerance: ANY registry timestamp column
    survives a TIMESTAMP(NANOS) physical form, not just events.ts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1704067200_000000, 1704153600_000000]
    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([10, 20], pa.int64()),
            "o_orderstatus": pa.array(["O", "F"]),
            "o_totalprice": pa.array([1.0, 2.0], pa.float64()),
            "o_orderdate": pa.array([m * 1000 for m in micros], pa.timestamp("ns")),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"]),
        }
    )
    d = tmp_path / "ns_orders"
    d.mkdir()
    pq.write_table(t, str(d / "orders.parquet"))
    rows = tables.load_table(spark, "orders", str(d)).orderBy("o_orderkey").collect()
    assert rows[0]["o_orderdate"].year == 2024
    assert tables.read_plan("orders", str(d)) == {"o_orderdate": "nanos-long"}


def test_missing_column_in_footer_is_loud(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"r_regionkey": pa.array([1], pa.int32())})  # r_name missing
    d = tmp_path / "r"
    d.mkdir()
    pq.write_table(t, str(d / "region.parquet"))
    with pytest.raises(schemas.SchemaDriftError, match="missing column 'r_name'"):
        tables.load_table(spark, "region", str(d))


def test_extra_footer_column_is_pruned(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "r_regionkey": pa.array([1], pa.int32()),
            "r_name": pa.array(["EUROPE"]),
            "surprise": pa.array([42], pa.int64()),
        }
    )
    d = tmp_path / "r2"
    d.mkdir()
    pq.write_table(t, str(d / "region.parquet"))
    df = tables.load_table(spark, "region", str(d))
    assert df.columns == ["r_regionkey", "r_name"]
    assert df.count() == 1


def test_raw_int_epoch_units_classified_by_magnitude(spark, tmp_path):
    """Round-4 review finding: a RAW int64 epoch column declares no
    unit. int64-MICROS must not be floor-divided as if nanos (the
    silent-1970s class); all four magnitude bands decode to the same
    logical timestamps, and a non-epoch int is loud."""
    import pyarrow as pa

    micros = [1704067200_000000, 1704067260_500000]
    cases = {
        "nanos-long": [m * 1000 for m in micros],
        "micros-long": micros,
        "millis-long": [m // 1000 for m in micros],
        "seconds-long": [m // 1_000_000 for m in micros],
    }
    decoded: dict[str, list] = {}
    for action, vals in cases.items():
        d = _write_events(tmp_path / action, pa.array(vals, pa.int64()))
        assert tables.read_plan("events", d)["ts"] == action
        rows = [r["ts"] for r in tables.load_table(spark, "events", d).orderBy("event_id").collect()]
        assert rows[0].year == 2024
        decoded[action] = rows
    # the millis band decodes to EXACTLY the micros values truncated to
    # the millisecond (review r6: a dead `expected` accumulator implied
    # this comparison without performing it); seconds band: year only
    assert decoded["millis-long"] == [
        t.replace(microsecond=t.microsecond // 1000 * 1000)
        for t in decoded["micros-long"]
    ]
    # micros and nanos forms agree exactly (ns floor-divides to µs)
    d_us = str(tmp_path / "micros-long")
    d_ns = str(tmp_path / "nanos-long")
    assert (
        tables.load_table(spark, "events", d_us).collect()
        == tables.load_table(spark, "events", d_ns).collect()
    )
    # non-epoch ints (sequence numbers) refuse to rescale
    d_bad = _write_events(tmp_path / "bad", pa.array([1, 2], pa.int64()))
    with pytest.raises(schemas.SchemaDriftError, match="no epoch magnitude band"):
        tables.load_table(spark, "events", d_bad)
