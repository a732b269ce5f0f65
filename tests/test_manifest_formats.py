"""File-skipping manifest (sources/manifest.py) and ORC/CSV format
breadth (sources/formats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_mastery_pipeline_spark.sources import formats, manifest, writers
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_SMOKE


def test_manifest_prunes_and_scan_is_exact(spark, tmp_path):
    ev = load_table(spark, "events", SF_SMOKE)
    path = str(tmp_path / "clustered")
    writers.write_clustered(ev, path, ["user_id"], num_files=8)
    man = manifest.build_manifest(spark, path, ["user_id"])
    assert man.count() == 8  # one row per file

    df, stats = manifest.skipping_scan(spark, man, "user_id", 3, 5)
    assert stats["files_read"] < stats["files_total"] == 8
    got = df.count()
    want = ev.filter(F.col("user_id").between(3, 5)).count()
    assert got == want


def test_manifest_empty_range_returns_empty_with_schema(spark, tmp_path):
    ev = load_table(spark, "events", SF_SMOKE)
    path = str(tmp_path / "clustered2")
    writers.write_clustered(ev, path, ["user_id"], num_files=4)
    man = manifest.build_manifest(spark, path, ["user_id"])
    df, stats = manifest.skipping_scan(spark, man, "user_id", 10_000, 20_000)
    assert stats["files_read"] == 0
    assert df.count() == 0
    assert "event_type" in df.columns  # schema preserved for downstream


def test_orc_roundtrip_bit_exact(spark, tmp_path):
    ev = load_table(spark, "events", SF_SMOKE)
    path = str(tmp_path / "orc")
    formats.write_orc(ev, path)
    back = formats.read_orc(spark, path)
    assert back.schema == ev.schema
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_csv_quarantine_splits_streams(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    lines = spark.createDataFrame(
        [("1,alice,1.5",), ("2,bob,2.5",), ("oops,carol,3.0",), ("4,dan,not_a_num",)],
        "value string",
    )
    path = str(tmp_path / "csv")
    lines.write.mode("overwrite").text(path)
    # no cache needed: from_csv-based parsing has no raw-scan
    # corrupt-column-only restriction (that applies to the CSV file source)
    parsed = formats.read_csv_quarantined(spark, path, schema)
    good = parsed.filter(F.col(formats.CORRUPT_COL).isNull())
    bad = parsed.filter(F.col(formats.CORRUPT_COL).isNotNull())
    assert good.count() == 2
    assert sorted(r.id for r in good.collect()) == [1, 2]
    # partial parse preserved on corrupt rows: the bad-id row still
    # carries its parseable name/score fields alongside the raw line
    carol = [r for r in bad.collect() if r.name == "carol"]
    assert carol and carol[0].id is None and carol[0].score == 3.0
    # the raw malformed line is preserved verbatim for the quarantine sink
    assert sorted(r[formats.CORRUPT_COL] for r in bad.collect()) == [
        "4,dan,not_a_num",
        "oops,carol,3.0",
    ]


def test_csv_short_row_is_padded_not_corrupt(spark, tmp_path):
    """Pinned engine contract: arity drift pads with nulls (schema
    guard's job), only type mismatches quarantine."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    lines = spark.createDataFrame([("7,eve",)], "value string")
    path = str(tmp_path / "csv_short")
    lines.write.mode("overwrite").text(path)
    parsed = formats.read_csv_quarantined(spark, path, schema).collect()
    assert len(parsed) == 1
    row = parsed[0]
    assert row.id == 7 and row.name == "eve" and row.score is None


def test_skipping_scan_empty_manifest_fails_loudly(spark):
    # ADVICE r05: zero-file manifest must raise a clear error, not an
    # opaque "path not specified" from spark.read.parquet(*[])
    import pytest

    empty = spark.createDataFrame(
        [], "file string, value_min double, value_max double"
    )
    with pytest.raises(ValueError, match="zero files"):
        manifest.skipping_scan(spark, empty, "value", 0.0, 1.0)


def test_skipping_scan_multi_empty_manifest_fails_loudly(spark):
    import pytest

    empty = spark.createDataFrame(
        [], "file string, a_min double, a_max double, b_min double, b_max double"
    )
    with pytest.raises(ValueError, match="zero files"):
        manifest.skipping_scan_multi(spark, empty, {"a": (0, 1), "b": (0, 1)})


def test_manifest_scan_keeps_hive_partition_columns(spark, tmp_path):
    """Review r6: reading pruned leaf files WITHOUT basePath drops hive
    partition columns from the scan schema — a predicate on one then
    fails to resolve. The manifest scan must behave like the root-path
    read it replaces."""
    ev = load_table(spark, "events", SF_SMOKE)
    path = str(tmp_path / "hive")
    writers.write_partitioned(
        writers.with_date_partitions(ev, "ts"), path, mode="overwrite"
    )
    man = manifest.build_manifest(spark, path, ["user_id", "month"])
    # partition-column predicate + data-column predicate together
    df, stats = manifest.skipping_scan_multi(
        spark, man, {"month": (1, 2), "user_id": (0, 7)}
    )
    assert {"year", "month", "day"} <= set(df.columns)
    want = ev.filter(
        (F.month("ts").between(1, 2)) & (F.col("user_id").between(0, 7))
    ).count()
    assert df.count() == want


def test_csv_header_option_drops_header_line(spark, tmp_path):
    sch = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    p = tmp_path / "h.csv"
    p.write_text("id,v\n1,2.5\n2,3.5\nbad,notanumber,extra\n")
    with_header = formats.read_csv_quarantined(spark, str(p), sch, header=True)
    rows = with_header.collect()
    clean = [r for r in rows if r["_corrupt_record"] is None]
    dirty = [r for r in rows if r["_corrupt_record"] is not None]
    assert {(r["id"], r["v"]) for r in clean} == {(1, 2.5), (2, 3.5)}
    assert len(dirty) == 1  # only the genuinely bad row, not the header
    # without the option the header line is quarantined as corrupt
    no_header = formats.read_csv_quarantined(spark, str(p), sch)
    assert (
        sum(r["_corrupt_record"] is not None for r in no_header.collect()) == 2
    )


def test_jsonl_quarantine_contract(spark, tmp_path):
    """sources/formats.py JSONL reader engine contract: clean lines
    parse with null _corrupt_record; a TYPE-MISMATCHED field marks the
    row corrupt while preserving parseable siblings; malformed JSON and
    non-JSON lines are corrupt with the raw line captured; extra fields
    not in the schema are ignored (NOT corruption — schema drift is the
    schema guard's job); round trip through gzip shards."""
    from pyspark.sql import types as T

    from data_mastery_pipeline_spark.sources import formats

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "fr", 20)], "doc_id long, lang string, n_chars long"
    )
    path = str(tmp_path / "jl")
    formats.write_jsonl(df, path, compression="gzip")
    spark.createDataFrame(
        [
            ('{"doc_id":"xx","lang":"de","n_chars":5}',),   # type mismatch
            ('{"doc_id": 3, "lang"',),                      # truncated
            ("plain text",),                                # not JSON
            ('{"doc_id":4,"lang":"es","n_chars":7,"extra":1}',),  # extra field
        ],
        "value string",
    ).coalesce(1).write.mode("append").option("compression", "gzip").text(path)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    out = formats.read_jsonl_quarantined(spark, path, schema)
    rows = {tuple(r) for r in out.collect()}
    assert (1, "en", 10, None) in rows and (2, "fr", 20, None) in rows
    assert (4, "es", 7, None) in rows  # extra field ignored, row clean
    corrupt = [r for r in rows if r[3] is not None]
    assert len(corrupt) == 3
    # type-mismatch preserves parseable siblings
    assert any(r[1] == "de" and r[2] == 5 and r[0] is None for r in corrupt)
    # raw lines captured verbatim
    assert any(r[3] == "plain text" for r in corrupt)
