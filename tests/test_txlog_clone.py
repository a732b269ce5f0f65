"""Shallow clone (TxTable.clone_to): zero-copy branch semantics —
no data files copied, full two-way divergence, DV carriage with
namespace translation, DML + bloom on foreign files, clone-of-clone,
and vacuum never reaching across roots."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.sources.txlog import ConflictError, TxTable

DDL = "k long, grp string, v double"


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _data_parquets(root):
    return glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                     recursive=True)


@pytest.fixture()
def src(spark, tmp_path):
    rows = [(i, "g%d" % (i % 3), float(i)) for i in range(40)]
    t = TxTable.create(
        spark,
        str(tmp_path / "src"),
        spark.createDataFrame(rows, DDL).repartition(3),
        stat_cols=["k", "v"],
    )
    return t


def test_clone_is_zero_copy_and_reads_equal(spark, src, tmp_path):
    dest = str(tmp_path / "clone")
    c = src.clone_to(dest)
    assert _data_parquets(dest) == [], "clone must copy no data files"
    assert _rows(c.read()) == _rows(src.read())
    assert c.version() == 0


def test_two_way_divergence(spark, src, tmp_path):
    c = src.clone_to(str(tmp_path / "clone"))
    c.delete_where("k", 0, 9)
    c.append(spark.createDataFrame([(100, "new", 1.5)], DDL))
    assert src.read().count() == 40, "source untouched by clone DML"
    assert c.read().count() == 31
    src.delete_where("k", 30, 39)
    assert src.read().count() == 30
    assert c.read().count() == 31, "clone untouched by source DML"
    assert _rows(c.read().filter("k = 100")) == [(100, "new", 1.5)]


def test_clone_carries_source_dvs(spark, src, tmp_path):
    src.delete_where("k", 5, 7, mode="dv")
    c = src.clone_to(str(tmp_path / "clone"))
    assert c.read().count() == 37
    assert _rows(c.read()) == _rows(src.read())
    # the DV positions must keep excluding rows after FURTHER clone DML
    c.delete_where("k", 10, 10, mode="dv")
    assert c.read().count() == 36
    assert c.read().filter(F.col("k").isin(5, 6, 7, 10)).count() == 0


def test_dv_delete_on_foreign_files_works(spark, src, tmp_path):
    """merge-on-read delete on a clone targets the SOURCE's files:
    sidecar identities must match at read (the _rel_path_col
    absolute-path branch)."""
    c = src.clone_to(str(tmp_path / "clone"))
    c.delete_where("k", 0, 4, mode="dv")
    assert c.read().count() == 35
    assert src.read().count() == 40
    # and a rewrite afterwards materializes them exactly once
    c.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    assert c.read().count() == 35


def test_clone_at_version_and_clone_of_clone(spark, src, tmp_path):
    v0 = src.version()
    src.delete_where("k", 0, 19)
    c_old = src.clone_to(str(tmp_path / "c_old"), version=v0)
    assert c_old.read().count() == 40
    c2 = c_old.clone_to(str(tmp_path / "c2"))
    assert c2.read().count() == 40
    assert _data_parquets(str(tmp_path / "c2")) == []


def test_bloom_on_clone_indexes_foreign_files(spark, src, tmp_path):
    c = src.clone_to(str(tmp_path / "clone"))
    c.build_bloom_index("k", fpp=0.001)
    df, st = c.scan({"k": (33, 33)})
    assert _rows(df) == [(33, "g0", 33.0)]
    # 3 source files by repartition(3); k values are hash-spread so
    # min/max overlap — the bloom must prune at least one file
    assert st["files_bloom_pruned"] >= 1, st


def test_clone_vacuum_never_reaps_source_files(spark, src, tmp_path):
    c = src.clone_to(str(tmp_path / "clone"))
    c.delete_where("k", 0, 39)  # rewrite: clone drops all foreign refs
    n_src_before = len(_data_parquets(src.root))
    c.vacuum(retention_sec=0.0)
    assert len(_data_parquets(src.root)) == n_src_before
    assert src.read().count() == 40


def test_clone_refuses_occupied_dest(spark, src, tmp_path):
    dest = str(tmp_path / "clone")
    src.clone_to(dest)
    with pytest.raises(ConflictError):
        src.clone_to(dest)


def test_clone_cdf_and_time_travel(spark, src, tmp_path):
    c = src.clone_to(str(tmp_path / "clone"))
    v0 = c.version()
    c.delete_where("k", 0, 9)
    feed = c.changes(v0)
    # rewrite-mode delete feeds remove+re-add per touched file; the NET
    # retraction must be exactly the 10 deleted rows
    n_del = feed.filter("_change_type = 'delete'").count()
    n_ins = feed.filter("_change_type = 'insert'").count()
    assert n_del - n_ins == 10, (n_del, n_ins)
    assert c.read(version=v0).count() == 40
