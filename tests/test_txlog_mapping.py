"""Column mapping (sources/txlog.py, r8): metadata-only RENAME/DROP
COLUMN with stable physical names — reads, stats pruning, CDF, time
travel, restore, and DML all stay correct across the rename, and a
dropped-then-readded column can never resurrect old data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.sources.txlog import TxTable

DDL = "id long, grp string, v double"


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "t")


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for df_r in [df] for r in df_r.collect())


def test_rename_is_metadata_only_and_reads_correctly(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.5), (2, "b", 2.5)]))
    files_before = {a["path"] for a in t.snapshot_adds()}
    t.alter_rename_column("v", "amount")
    assert {a["path"] for a in t.snapshot_adds()} == files_before  # 0 rewrites
    got = _rows(t.read(), "id", "grp", "amount")
    assert got == [(1, "a", 1.5), (2, "b", 2.5)]
    assert "v" not in t.read().columns
    # the PHYSICAL parquet column is still 'v' — the mapping is real,
    # not a lazy rewrite
    import pyarrow.parquet as pq

    f = os.path.join(root, sorted(files_before)[0])
    assert "v" in pq.read_schema(f).names


def test_append_and_dml_after_rename(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.alter_rename_column("v", "amount")
    t.append(
        spark.createDataFrame([(2, "b", 2.0)], "id long, grp string, amount double")
    )
    assert _rows(t.read(), "id", "amount") == [(1, 1.0), (2, 2.0)]
    # stats pruning works through the mapping (both pre- and
    # post-rename files): delete by the NEW name
    t.delete_where("amount", 2.0, 2.0)
    assert _rows(t.read(), "id", "amount") == [(1, 1.0)]
    t.update_where("amount", 1.0, 1.0, {"amount": F.col("amount") + 9.0})
    assert _rows(t.read(), "id", "amount") == [(1, 10.0)]
    # dv-mode against the renamed column too
    t.append(
        spark.createDataFrame([(3, "c", 7.0)], "id long, grp string, amount double")
    )
    t.delete_where("amount", 7.0, 7.0, mode="dv")
    assert _rows(t.read(), "id", "amount") == [(1, 10.0)]
    # keyed merge on an untouched key column, post-rename
    t.merge_upsert(
        spark.createDataFrame([(1, "z", 0.5)], "id long, grp string, amount double"),
        "id",
    )
    assert _rows(t.read(), "id", "grp", "amount") == [(1, "z", 0.5)]


def test_cdf_and_time_travel_span_the_rename(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 2.0)]))
    v_before = t.version()
    t.alter_rename_column("v", "amount")
    t.append(
        spark.createDataFrame([(3, "c", 3.0)], "id long, grp string, amount double")
    )
    # CDF over the WHOLE history reads under the END schema: pre-rename
    # files surface as 'amount'
    feed = t.changes(-1)
    assert "amount" in feed.columns and "v" not in feed.columns
    net = feed.groupBy("id", "grp", "amount").agg(
        F.sum(
            F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        ).alias("n")
    )
    assert _rows(net.filter("n = 1").drop("n"), "id", "amount") == [
        (1, 1.0),
        (2, 2.0),
        (3, 3.0),
    ]
    # time travel reads each version under ITS OWN logical schema
    old = t.read(version=v_before)
    assert "v" in old.columns and "amount" not in old.columns
    assert _rows(old, "id", "v") == [(1, 1.0), (2, 2.0)]


def test_restore_across_rename_restores_old_name(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    v0 = t.version()
    t.alter_rename_column("v", "amount")
    t.append(
        spark.createDataFrame([(2, "b", 2.0)], "id long, grp string, amount double")
    )
    t.restore(v0)
    assert "v" in t.read().columns  # the old logical schema came back
    assert _rows(t.read(), "id", "v") == [(1, 1.0)]
    # and CDF replays exactly across the restore
    feed = t.changes(-1)
    net = feed.groupBy("id", "v").agg(
        F.sum(
            F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        ).alias("n")
    )
    assert _rows(net.filter("n = 1").drop("n"), "id", "v") == [(1, 1.0)]


def test_drop_column_and_no_resurrection_on_readd(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    v_before = t.version()
    t.alter_drop_column("grp")
    assert t.read().columns == ["id", "v"]  # metadata-only drop
    # time travel still sees the dropped column's data
    assert _rows(t.read(version=v_before), "id", "grp") == [
        (1, "a"),
        (2, "b"),
    ]
    # re-adding the same name binds a FRESH physical: old values must
    # NOT come back
    t.alter_add_column("grp", "string")
    assert _rows(t.read(), "id", "grp") == [(1, None), (2, None)]
    t.append(
        spark.createDataFrame([(3, 3.0, "c")], "id long, v double, grp string")
    )
    got = {r["id"]: r["grp"] for r in t.read().collect()}
    assert got == {1: None, 2: None, 3: "c"}


def test_rename_refusals(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    with pytest.raises(ValueError, match="already exists"):
        t.alter_rename_column("v", "grp")
    with pytest.raises(ValueError, match="no column"):
        t.alter_rename_column("nope", "x")
    t.add_constraint("pos_v", "v >= 0")
    with pytest.raises(ValueError, match="pos_v"):
        t.alter_rename_column("v", "amount")
    with pytest.raises(ValueError, match="pos_v"):
        t.alter_drop_column("v")
    t.drop_constraint("pos_v")
    t.alter_rename_column("v", "amount")  # now fine
    with pytest.raises(ValueError, match="last column"):
        t2 = TxTable.create(
            spark, root + "2", spark.createDataFrame([(1,)], "x long")
        )
        t2.alter_drop_column("x")


def test_optimize_and_scan_pruning_after_rename(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 5.0)]))
    t.alter_rename_column("v", "amount")
    t.append(
        spark.createDataFrame([(3, "c", 9.0)], "id long, grp string, amount double")
    )
    df, stats = t.scan({"amount": (8.0, 10.0)})
    assert _rows(df, "id", "amount") == [(3, 9.0)]
    assert stats["files_read"] < stats["files_total"]  # pruning held
    t.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    assert _rows(t.read(), "id", "amount") == [(1, 1.0), (2, 5.0), (3, 9.0)]


def test_streaming_feed_reads_across_rename(spark, root):
    from data_mastery_pipeline_spark.sources import txlog as txmod

    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.alter_rename_column("v", "amount")
    t.append(
        spark.createDataFrame([(2, "b", 2.0)], "id long, grp string, amount double")
    )
    txmod.register(spark)
    q = (
        spark.readStream.format("txlog_feed")
        .option("root", root)
        .load()
        .writeStream.format("memory")
        .queryName("map_feed")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark.table("map_feed"), "id", "amount")
    assert got == [(1, 1.0), (2, 2.0)]  # pre-rename file read by physical
