"""replace_where (sources/txlog.py): atomic predicate overwrite — the
public Delta ``replaceWhere`` / dynamic-partition-overwrite pattern.
The contract under test: one commit swaps the slice, incoming rows
outside the slice refuse loudly, re-running the same load is
idempotent, untouched files are never rewritten, the CDF replays
exactly across the commit, and interleaved writers conflict like
delete/merge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.sources.txlog import ConflictError, TxTable

DDL = "k long, grp string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def test_replace_swaps_slice_atomically(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 9.0)])
    )
    v = t.replace_where("v", 1.0, 2.5, _df(spark, [(20, "r", 2.0)]))
    assert v == 1  # ONE commit
    assert _rows(t.read()) == [(3, "b", 9.0), (20, "r", 2.0)]
    assert [h["op"] for h in t.history()][-1] == "replace"


def test_replace_rerun_is_idempotent(spark, root):
    """The daily-reload shape: landing the same slice twice replaces,
    never duplicates."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 9.0)]))
    load = _df(spark, [(10, "d", 1.25), (11, "d", 1.75)])
    t.replace_where("v", 1.0, 2.0, load)
    first = _rows(t.read())
    t.replace_where("v", 1.0, 2.0, load)
    assert _rows(t.read()) == first


def test_incoming_row_outside_slice_refuses(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    v0 = t.version()
    with pytest.raises(Exception, match="outside"):
        t.replace_where("v", 1.0, 2.0, _df(spark, [(9, "z", 50.0)]))
    assert t.version() == v0  # nothing committed
    # a NULL predicate value is not inside any slice either
    with pytest.raises(Exception, match="outside"):
        t.replace_where("v", 1.0, 2.0, _df(spark, [(9, "z", None)]))
    assert t.version() == v0


def test_null_rows_in_table_are_kept(spark, root):
    """ANSI: NULL never matches the predicate — existing NULL-v rows
    survive the replace verbatim."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0), (2, "n", None)]))
    t.replace_where("v", 0.0, 5.0, _df(spark, [(10, "r", 3.0)]))
    assert _rows(t.read()) == [(2, "n", None), (10, "r", 3.0)]


def test_insert_only_and_delete_only_forms(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    # no file overlaps the slice -> pure validated insert
    t.replace_where("v", 100.0, 200.0, _df(spark, [(5, "c", 150.0)]))
    assert _rows(t.read()) == [(1, "a", 1.0), (5, "c", 150.0)]
    # empty frame -> predicate delete
    t.replace_where("v", 100.0, 200.0, _df(spark, []))
    assert _rows(t.read()) == [(1, "a", 1.0)]
    # empty slice replaced with nothing -> version no-op, no commit
    v = t.version()
    assert t.replace_where("v", 500.0, 600.0, _df(spark, [])) == v
    assert t.version() == v


def test_blast_radius_untouched_files_survive(spark, root):
    """Files whose stats are disjoint from the slice are not rewritten
    — same O(matching files) discipline as delete_where."""
    t = TxTable.create(spark, root, _df(spark, [(1, "lo", 5.0)]))
    t.append(_df(spark, [(2, "hi", 100.0)]))
    before = {a["path"] for a in t.snapshot_adds()}
    t.replace_where("v", 90.0, 110.0, _df(spark, [(20, "r", 95.0)]))
    after = {a["path"] for a in t.snapshot_adds()}
    lo_file = [p for p in before if p in after]
    assert len(lo_file) == 1  # the v=5.0 file survived the commit


def test_cdf_replays_exactly_across_replace(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.delete_where("v", 2.0, 2.0, mode="dv")  # DV state in play
    t.replace_where("v", 0.0, 5.0, _df(spark, [(10, "r", 3.0), (11, "r", 4.0)]))
    net = (
        t.changes(-1)
        .groupBy("k", "grp", "v")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("n")
        )
    )
    assert net.filter(~F.col("n").isin(0, 1)).count() == 0
    recon = _rows(net.filter("n = 1").drop("n"))
    assert recon == _rows(t.read())
    # the replace's delete side must NOT resurrect the DV'd row: the
    # row deleted at the dv commit appears as a delete exactly once
    dv_row = t.changes(-1).filter("k = 2 and _change_type = 'delete'")
    assert dv_row.count() == 1


def test_interleaved_overlapping_append_conflicts(spark, root):
    """Two handles: a replace planned before an overlapping append
    commits must raise — the slice swap was computed against a stale
    snapshot (same class as delete/merge)."""
    a = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    b = TxTable(spark, root)
    rv = a.version()
    meta, live, _, dvs = a._state_at(rv)
    adds = a._write_stage(
        a._conform(_df(spark, [(10, "r", 1.5)]), meta), meta["stat_cols"]
    )
    b.append(_df(spark, [(2, "x", 1.2)]))  # lands inside the slice
    with pytest.raises(ConflictError, match="stale snapshot|overlapping"):
        a._commit("replace", adds, [], {"v": (1.0, 2.0)}, read_version=rv)
    # disjoint interleaved append is serializable
    rv2 = a.version()
    meta2, _, _, _ = a._state_at(rv2)
    adds2 = a._write_stage(
        a._conform(_df(spark, [(11, "r", 1.6)]), meta2), meta2["stat_cols"]
    )
    b.append(_df(spark, [(3, "y", 99.0)]))  # outside the slice
    v = a._commit("replace", adds2, [], {"v": (1.0, 2.0)}, read_version=rv2)
    assert v == b.version() + 1 - 1 + 1 or v > rv2  # committed past it


def test_replace_after_rename_uses_logical_name(spark, root):
    """Column mapping: replace addresses the CURRENT logical name and
    prunes through the physically-keyed stats of pre-rename files."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 9.0)]))
    t.alter_rename_column("v", "amount")
    t.replace_where(
        "amount",
        0.0,
        2.0,
        spark.createDataFrame([(10, "r", 1.5)], "k long, grp string, amount double"),
    )
    got = sorted((r.k, r.amount) for r in t.read().collect())
    assert got == [(2, 9.0), (10, 1.5)]


def test_vacuum_dry_run_reports_without_deleting(spark, root):
    """DRY RUN returns exactly what a real vacuum would reclaim, and
    touches nothing."""
    import os as _os

    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.delete_where("v", 0.0, 5.0)  # orphans the original file
    would = t.vacuum(retention_sec=0.0, dry_run=True)
    assert would  # the pre-delete file is unreferenced
    for rel in would:
        assert _os.path.exists(_os.path.join(root, rel))  # still there
    real = t.vacuum(retention_sec=0.0)
    assert real == would
    for rel in real:
        assert not _os.path.exists(_os.path.join(root, rel))


def test_maintenance_advice_names_the_right_verbs(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 200.0)]).coalesce(1)
    )
    for i in range(3):  # accrete small files
        t.append(_df(spark, [(10 + i, "c", 300.0 + i)]).coalesce(1))
    t.delete_where("v", 200.0, 200.0, mode="dv")  # dv debt
    t.delete_where("v", 300.0, 300.0)  # rewrite -> orphan candidate
    adv = t.maintenance_advice(small_file_bytes=32 << 20, retention_sec=0.0)
    assert adv["n_small_files"] >= 3
    assert adv["dv_debt_rows"] == 1 and adv["dv_debt_files"] == 1
    assert adv["n_vacuum_orphans"] >= 1
    kinds = " ".join(adv["actions"])
    assert "compact" in kinds and "dv-deleted" in kinds and "vacuum" in kinds
    # a compact, debt-paying, vacuumed table quiets down
    t.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    t.vacuum(retention_sec=0.0)
    adv2 = t.maintenance_advice(small_file_bytes=1, retention_sec=3600.0)
    assert adv2["dv_debt_rows"] == 0 and adv2["n_vacuum_orphans"] == 0
