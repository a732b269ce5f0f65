"""Scd2Dimension (scd.py): type-2 dimension maintained from a txlog
change feed. Pins the netting (rewrite churn mints no phantom rows),
interval assembly (close-on-next-event, tombstone, rebirth),
incremental ≡ one-shot, current() ≡ source live rows, exactly-once
replay, and the loud keyed-source precondition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.scd import Scd2Dimension
from data_mastery_pipeline_spark.sources.txlog import TxTable

DDL = "uid long, tier string, score double"


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _ivals(dim: Scd2Dimension):
    return sorted(
        (r.uid, r.tier, r.score, r.valid_from, r.valid_to, r.is_current)
        for r in dim.read().collect()
    )


@pytest.fixture()
def src(spark, tmp_path):
    return TxTable.create(
        spark,
        str(tmp_path / "src"),
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]),
    )


def test_full_history_backfill(spark, tmp_path, src):
    src.merge_upsert(_df(spark, [(2, "gold", 20.0)]), "uid")  # v1 update
    src.delete_where("uid", 3, 3)  # v2 tombstone
    src.merge_upsert(_df(spark, [(3, "b", 30.0)]), "uid")  # v3 rebirth
    dim = Scd2Dimension.create(
        spark, src, str(tmp_path / "dim"), "uid", "t"
    )
    assert dim.apply() == 3
    assert _ivals(dim) == [
        (1, "a", 1.0, 0, None, True),
        (2, "a", 2.0, 0, 1, False),
        (2, "gold", 20.0, 1, None, True),
        (3, "b", 3.0, 0, 2, False),
        (3, "b", 30.0, 3, None, True),
    ]


def test_incremental_equals_one_shot_and_current_equals_source(
    spark, tmp_path, src
):
    dim = Scd2Dimension.create(spark, src, str(tmp_path / "dim"), "uid", "inc")
    dim.apply()  # window 1: just the create
    src.merge_upsert(_df(spark, [(1, "up", 100.0), (9, "new", 9.0)]), "uid")
    src.delete_where("uid", 2, 2)
    assert dim.apply() == src.version()  # window 2: update+insert+delete
    one = Scd2Dimension.create(
        spark, src, str(tmp_path / "dim2"), "uid", "oneshot"
    )
    one.apply()
    assert _ivals(dim) == _ivals(one)
    # current() ≡ source live rows
    cur = sorted(
        (r.uid, r.tier, r.score)
        for r in dim.current().select("uid", "tier", "score").collect()
    )
    live = sorted(tuple(r) for r in src.read().collect())
    assert cur == live


def test_replay_is_exactly_once(spark, tmp_path, src):
    dim = Scd2Dimension.create(spark, src, str(tmp_path / "dim"), "uid", "r")
    dim.apply()
    v = dim.target.version()
    assert dim.apply() is None  # already current
    assert dim.target.version() == v


def test_rewrite_churn_mints_no_phantom_rows(spark, tmp_path):
    """A copy-on-write delete rewrites its file, re-emitting every
    neighbor row as a same-version delete+insert pair in the CDF —
    netting must cancel them: untouched keys keep exactly ONE
    interval, still open at valid_from=0."""
    src = TxTable.create(
        spark,
        str(tmp_path / "src"),
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0)]).coalesce(1),
    )
    src.delete_where("uid", 2, 2)  # rewrites the single file
    dim = Scd2Dimension.create(spark, src, str(tmp_path / "dim"), "uid", "c")
    dim.apply()
    ivals = _ivals(dim)
    assert ivals == [
        (1, "a", 1.0, 0, None, True),
        (2, "a", 2.0, 0, 1, False),
        (3, "a", 3.0, 0, None, True),
    ]


def test_all_churn_window_advances_watermark_without_wedging(
    spark, tmp_path, src
):
    dim = Scd2Dimension.create(spark, src, str(tmp_path / "dim"), "uid", "w")
    dim.apply()
    src.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    before = _ivals(dim)
    assert dim.apply() == src.version()  # folds to zero events
    assert dim.last_applied() == src.version()
    assert dim.apply() is None  # and does not wedge stale
    assert _ivals(dim) == before


def test_unkeyed_source_raises_loudly(spark, tmp_path, src):
    src.append(_df(spark, [(1, "dup", 999.0)]))  # second live row for uid 1
    dim = Scd2Dimension.create(spark, src, str(tmp_path / "dim"), "uid", "x")
    with pytest.raises(Exception, match="not a keyed current-state"):
        dim.apply()


def test_null_keys_dropped_not_tracked(spark, tmp_path):
    src = TxTable.create(
        spark,
        str(tmp_path / "src"),
        _df(spark, [(1, "a", 1.0), (None, "n", 0.0)]),
    )
    dim = Scd2Dimension.create(spark, src, str(tmp_path / "dim"), "uid", "n")
    dim.apply()
    assert [r.uid for r in dim.read().collect()] == [1]
