"""Bloom file-skipping index on the transaction-log format
(TxTable.build_bloom_index / scan): no false negatives ever, real
pruning on unclustered point lookups, physical-name keying across
renames, death with the file, checkpoint survival, and CDF silence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.sources.txlog import TxTable

DDL = "k long, grp string, v double"


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _unclustered(spark, root, n=400, chunks=4):
    """k spans the full range in EVERY file — min/max can't prune a
    point lookup, blooms must."""
    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 7).cast("string")).alias("grp"),
        (F.col("id") * 0.5).alias("v"),
    )
    t = TxTable.create(
        spark,
        root,
        base.filter(F.col("k") % chunks == 0).coalesce(1),
        stat_cols=["k", "v"],
    )
    for c in range(1, chunks):
        t.append(base.filter(F.col("k") % chunks == c).coalesce(1))
    return t


def test_point_lookup_prunes_and_is_exact(spark, root):
    t = _unclustered(spark, root)
    t.build_bloom_index("k", fpp=0.001)
    df, st = t.scan({"k": (201, 201)})
    assert st["files_total"] == 4
    assert st["files_bloom_pruned"] >= 2, st
    assert st["files_read"] < st["files_total"]
    assert _rows(df) == [(201, "g5", 100.5)]


def test_no_false_negatives_across_sample(spark, root):
    t = _unclustered(spark, root)
    t.build_bloom_index("k", fpp=0.01)
    plain = t.read()
    for k in range(0, 400, 29):
        df, _ = t.scan({"k": (k, k)})
        assert _rows(df) == _rows(plain.filter(F.col("k") == k)), k


def test_range_predicates_ignore_blooms(spark, root):
    t = _unclustered(spark, root)
    t.build_bloom_index("k", fpp=0.01)
    df, st = t.scan({"k": (10, 20)})
    assert st["files_bloom_pruned"] == 0
    assert df.count() == 11


def test_bloom_survives_rename_and_checkpoint(spark, root):
    t = _unclustered(spark, root)
    t.build_bloom_index("k", fpp=0.001)
    t.alter_rename_column("k", "key")
    # force a checkpoint and reopen cold: bloom must ride the full-state
    # checkpoint on the live add entries
    t._write_checkpoint(t.version())
    t2 = TxTable(spark, root)
    df, st = t2.scan({"key": (201, 201)})
    assert st["files_bloom_pruned"] >= 2, st
    assert _rows(df) == [(201, "g5", 100.5)]


def test_rewritten_files_lose_blooms_conservatively(spark, root):
    t = _unclustered(spark, root)
    t.build_bloom_index("k", fpp=0.001)
    # rewrite-mode delete touches every file (v spans all files too):
    # replacement files carry NO bloom and must be kept for any probe
    t.delete_where("v", 0.0, 1.0)  # kills k in {0, 1, 2}
    df, st = t.scan({"k": (201, 201)})
    assert _rows(df) == [(201, "g5", 100.5)]
    # incremental rebuild indexes only the bloom-less files
    v1 = t.build_bloom_index("k", fpp=0.001)
    v2 = t.build_bloom_index("k", fpp=0.001)
    assert v2 == v1, "second build should be a no-op (all files indexed)"
    df2, st2 = t.scan({"k": (201, 201)})
    assert st2["files_bloom_pruned"] >= 1
    assert _rows(df2) == [(201, "g5", 100.5)]
    # the deleted key now prunes EVERYTHING (no file can contain it)
    df3, st3 = t.scan({"k": (1, 1)})
    assert df3.count() == 0


def test_all_null_column_file_gets_empty_bloom(spark, root):
    rows = spark.createDataFrame(
        [(None, "g0", 1.0), (None, "g1", 2.0)], DDL
    )
    t = TxTable.create(spark, root, rows.coalesce(1), stat_cols=["v"])
    t.append(
        spark.createDataFrame([(5, "g2", 3.0)], DDL).coalesce(1)
    )
    t.build_bloom_index("k", fpp=0.01)
    df, st = t.scan({"k": (7, 7)})
    # the all-NULL file prunes for ANY non-null probe; the (5,...) file
    # prunes for 7 via its bloom
    assert st["files_bloom_pruned"] == 2, st
    assert df.count() == 0
    df2, _ = t.scan({"k": (5, 5)})
    assert _rows(df2) == [(5, "g2", 3.0)]


def test_bloom_commit_is_cdf_silent_and_time_travel_clean(spark, root):
    t = _unclustered(spark, root)
    v_before = t.version()
    v_bloom = t.build_bloom_index("k", fpp=0.01)
    assert v_bloom == v_before + 1
    feed = t.changes(start_version=v_before, end_version=v_bloom)
    assert feed.count() == 0, "bloom commit must emit no CDF rows"
    # time travel to the pre-bloom version still reads everything
    assert t.read(version=v_before).count() == 400


def test_bloom_for_concurrently_removed_file_is_dropped(spark, root):
    t = _unclustered(spark, root)
    t.build_bloom_index("k", fpp=0.01)
    # a rewrite-mode delete removes files AFTER the bloom build: replay
    # must not resurrect blooms onto dead entries, and scans stay exact
    t.delete_where("v", 0.0, 50.0)  # kills k ≤ 100, rewrites every file
    df, _ = t.scan({"k": (399, 399)})
    assert _rows(df) == [(399, "g0", 199.5)]
