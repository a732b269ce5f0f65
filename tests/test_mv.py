"""Materialized-view tests (mv.py): incremental refresh equivalence,
exactly-once replay, staleness guard, navigation gates, tombstones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.mv import (
    StaleViewError,
    SumCountView,
)
from data_mastery_pipeline_spark.sources.txlog import TxTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, grp string, day string, v double"
    )


def _mk(spark, root, rows):
    src = TxTable.create(spark, root + "/src", _df(spark, rows))
    view = SumCountView.create(
        spark,
        src,
        root + "/mv",
        "t",
        dims={"grp": "grp", "day": "day"},
        value_expr="v",
    )
    return src, view


def _direct(src, *dims):
    return sorted(
        tuple(r)
        for r in src.read()
        .filter(F.col("grp").isNotNull())
        .groupBy(*dims)
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(
                F.coalesce(
                    F.floor(F.col("v") * 100 + F.lit(0.5)).cast("bigint"),
                    F.lit(0),
                )
            ).alias("sum_cents"),
        )
        .collect()
    )


def _mv(view, *dims):
    return sorted(tuple(r) for r in view.answer(list(dims)).collect())


def test_incremental_refresh_tracks_dml(spark, root):
    src, view = _mk(
        spark,
        root,
        [(i, "g%d" % (i % 2), "d%d" % (i % 3), float(i)) for i in range(10)],
    )
    assert view.refresh() == 0
    assert _mv(view, "grp", "day") == _direct(src, "grp", "day")
    # append + MOR delete + rewrite update, multiple commits per refresh
    src.append(_df(spark, [(20, "g0", "d9", 2.5), (21, "g2", "d0", 4.0)]))
    src.delete_where("v", 2.0, 4.0, mode="dv")
    src.update_where("v", 8.0, 9.0, {"v": "v + 0.115"})
    assert view.refresh() == src.version()
    assert _mv(view, "grp", "day") == _direct(src, "grp", "day")
    # coarser-grain navigation matches a direct coarser aggregate
    assert _mv(view, "grp") == _direct(src, "grp")


def test_refresh_exactly_once_and_noop(spark, root):
    src, view = _mk(spark, root, [(1, "a", "d", 1.0)])
    assert view.refresh() == 0
    v = view.target.version()
    assert view.refresh() is None  # current → no commit
    assert view.target.version() == v
    src.append(_df(spark, [(2, "a", "d", 2.0)]))
    assert view.refresh() == src.version()
    assert view.refresh() is None
    assert _mv(view, "grp") == _direct(src, "grp")


def test_staleness_guard_and_finer_grain_rejected(spark, root):
    src, view = _mk(spark, root, [(1, "a", "d", 1.0)])
    view.refresh()
    src.append(_df(spark, [(2, "b", "d", 2.0)]))
    assert view.is_stale()
    with pytest.raises(StaleViewError, match="refresh"):
        view.answer(["grp"])
    # eventually-consistent read serves the OLD snapshot, explicitly
    assert _mv_rows_strictless(view) == [("a", 1, 100)]
    with pytest.raises(ValueError, match="FINER"):
        view.answer(["grp", "id"], strict=False)
    view.refresh()
    assert _mv(view, "grp") == _direct(src, "grp")


def _mv_rows_strictless(view):
    return sorted(
        tuple(r) for r in view.answer(["grp"], strict=False).collect()
    )


def test_refresh_over_empty_delta_range_advances_watermark(spark, root):
    """A CDF range that folds to ZERO delta rows (optimize-only
    commits; the CDF excludes them) must still advance the refresh
    watermark — otherwise the view is stale FOREVER and strict
    answer() raises on every call while every retry re-reads the same
    empty range (review r7)."""
    src, view = _mk(
        spark, root, [(i, "a", "d", float(i)) for i in range(6)]
    )
    view.refresh()
    # two commits, zero CDF rows: optimize compacts the small files
    src.append(_df(spark, [(10, "a", "d", 1.0)]))
    src.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    assert view.refresh() == src.version()  # append folds, optimize skips
    assert not view.is_stale()
    # now a metadata-ONLY advance: the delta is empty end to end
    # (alter commits carry no add/remove, so the CDF range has 0 rows)
    src.alter_add_column("extra", "double")
    assert src.version() > view.last_refreshed()
    assert view.refresh() == src.version()
    assert not view.is_stale()  # wedged forever before the fix
    assert view.refresh() is None  # and the watermark replays as no-op
    assert _mv(view, "grp") == _direct(src, "grp")


def test_null_dims_excluded_and_tombstones_hidden(spark, root):
    src, view = _mk(
        spark, root, [(1, None, "d", 1.0), (2, "a", "d", 3.0)]
    )
    view.refresh()
    assert _mv(view, "grp") == [("a", 1, 300)]  # NULL dim never lands
    src.delete_where("v", 3.0, 3.0)  # retract the only 'a' row
    view.refresh()
    assert _mv(view, "grp") == []  # tombstone hidden
    assert view.target.read().filter("n_rows = 0").count() == 1
