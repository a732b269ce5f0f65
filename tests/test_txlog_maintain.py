"""purge_deletes + auto_maintain: the maintenance POLICY executes what
maintenance_advice names, DV debt is materialized on files optimize's
small-file selector would never pick, and the visible row multiset is
invariant throughout (dataChange=false — CDF silent)."""

from __future__ import annotations

import pytest

from data_mastery_pipeline_spark.sources.txlog import TxTable

DDL = "k long, grp string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def test_purge_deletes_materializes_dv_debt(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(i, "a", float(i)) for i in range(100)])
    )
    t.delete_where("k", 10, 19, mode="dv")
    assert sum(t.dv_stats().values()) == 10
    before = _rows(t.read())
    v = t.purge_deletes()
    assert sum(t.dv_stats().values()) == 0
    assert _rows(t.read()) == before
    # the purge commit is an optimize op, invisible to the change feed
    hist = {h["version"]: h["op"] for h in t.history()}
    assert hist[v] == "optimize"
    cdf = t.changes(v, v)
    assert cdf.count() == 0


def test_purge_skips_large_files_is_false(spark, root):
    """The motivating case: a file too big for optimize's small-file
    selector still gets purged (optimize alone leaves the DV)."""
    t = TxTable.create(
        spark, root, _df(spark, [(i, "b", 1.0) for i in range(1000)])
    )
    t.delete_where("k", 0, 4, mode="dv")
    t.optimize(small_file_bytes=1)  # selects nothing: every file "big"
    assert sum(t.dv_stats().values()) == 5
    t.purge_deletes()
    assert sum(t.dv_stats().values()) == 0
    assert t.read().count() == 995


def test_purge_noop_without_debt(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    v = t.version()
    assert t.purge_deletes() == v  # no commit minted


def test_auto_maintain_executes_the_advice(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(0, "a", 0.0)]))
    for i in range(1, 6):  # five tiny appends -> small-file debt
        t.append(_df(spark, [(i, "a", float(i))]))
    t.delete_where("k", 2, 3, mode="dv")
    before = _rows(t.read())
    report = t.auto_maintain(retention_sec=3600.0)
    assert "optimize" in report["executed"]
    assert "purge_deletes" in report["executed"]
    assert _rows(t.read()) == before
    # the gauge is clean afterwards (nothing left to advise except
    # the orphans the rewrites themselves just created, which stay
    # age-gated behind retention)
    after = t.maintenance_advice(retention_sec=3600.0)
    assert after["n_small_files"] <= 1
    assert after["dv_debt_rows"] == 0


def test_auto_maintain_vacuums_aged_orphans(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(i, "a", float(i)) for i in range(10)])
    )
    t.append(_df(spark, [(10, "a", 10.0)]))
    t.optimize(small_file_bytes=1 << 30)  # compacts, orphaning inputs
    t.expire(keep_last=1)  # old versions gone -> inputs unreferenced
    report = t.auto_maintain(retention_sec=0.0)
    assert "vacuum" in report["executed"]
    assert t.maintenance_advice(retention_sec=0.0)["n_vacuum_orphans"] == 0
    assert t.read().count() == 11


def test_auto_maintain_noop_on_healthy_table(spark, root):
    # one input partition -> ONE data file; otherwise createDataFrame's
    # parallelism writes a tiny file per partition and the table
    # legitimately NEEDS compaction
    t = TxTable.create(
        spark,
        root,
        _df(spark, [(i, "a", float(i)) for i in range(10)]).coalesce(1),
    )
    report = t.auto_maintain(retention_sec=3600.0)
    # physically healthy, but never ANALYZEd: the first cycle owes the
    # stats catalog one aggregate pass (r10 ANALYZE->CBO hook) and
    # nothing else; the second cycle is the true no-op
    assert report["executed"] == ["analyze"]
    assert report["version"] == t.version()
    assert t.stats_version() == t.version()
    again = t.auto_maintain(retention_sec=3600.0)
    assert again["executed"] == []
    # the hook is also suppressible (a caller that wants the pure
    # physical-maintenance verbs)
    t2 = TxTable(spark, t.root)
    assert "analyze" not in t2.auto_maintain(analyze=False)["executed"]
