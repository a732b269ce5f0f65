"""Write-Audit-Publish (wap.py): staged-branch isolation, audit-trims
the publish set, exactly-once replay, incremental publishes, loud
refusal of base-row retraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.sources.txlog import TxTable
from data_mastery_pipeline_spark.wap import WapBranch

DDL = "k long, grp string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def src(spark, tmp_path):
    return TxTable.create(
        spark, str(tmp_path / "src"), _df(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    )


def test_branch_isolates_until_publish(spark, tmp_path, src):
    wap = WapBranch.open(src, str(tmp_path / "br"))
    wap.branch.append(_df(spark, [(10, "n", 100.0)]))
    assert _rows(src.read()) == [(1, "a", 1.0), (2, "b", 2.0)]  # isolated
    assert wap.publish() is not None
    assert _rows(src.read()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
        (10, "n", 100.0),
    ]


def test_audit_trims_the_publish_set(spark, tmp_path, src):
    """The audit deletes bad rows ON THE BRANCH; only survivors
    publish."""
    wap = WapBranch.open(src, str(tmp_path / "br"))
    wap.branch.append(
        _df(spark, [(10, "good", 100.0), (11, "bad", 666.0), (12, "good", 101.0)])
    )
    wap.branch.delete_where("v", 666.0, 666.0)  # the audit's quarantine
    wap.publish()
    assert _rows(src.read()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
        (10, "good", 100.0),
        (12, "good", 101.0),
    ]


def test_publish_replay_is_exactly_once_and_incremental(spark, tmp_path, src):
    wap = WapBranch.open(src, str(tmp_path / "br"))
    wap.branch.append(_df(spark, [(10, "n", 100.0)]))
    wap.publish()
    v = src.version()
    assert wap.publish() is None  # replay: nothing new
    assert src.version() == v
    wap.branch.append(_df(spark, [(11, "n", 101.0)]))
    wap.publish()  # incremental: only the new batch lands
    got = _rows(src.read())
    assert (10, "n", 100.0) in got and (11, "n", 101.0) in got
    assert len(got) == 4  # no double-publish of batch 1


def test_branch_update_publishes_only_corrected_row(spark, tmp_path, src):
    wap = WapBranch.open(src, str(tmp_path / "br"))
    wap.branch.append(_df(spark, [(10, "n", 100.0)]))
    wap.branch.update_where("v", 100.0, 100.0, {"v": F.lit(999.0)})
    wap.publish()
    got = _rows(src.read())
    assert (10, "n", 999.0) in got and (10, "n", 100.0) not in got


def test_retracting_base_rows_refuses_loudly(spark, tmp_path, src):
    wap = WapBranch.open(src, str(tmp_path / "br"))
    wap.branch.delete_where("v", 1.0, 1.0)  # reaches into cloned base
    before = _rows(src.read())
    with pytest.raises(ValueError, match="retracts rows inherited"):
        wap.publish()
    assert _rows(src.read()) == before


def test_all_deleted_batch_advances_watermark(spark, tmp_path, src):
    wap = WapBranch.open(src, str(tmp_path / "br"))
    wap.branch.append(_df(spark, [(10, "bad", 666.0)]))
    wap.branch.delete_where("v", 666.0, 666.0)
    before = _rows(src.read())
    assert wap.publish() is not None  # empty append carries watermark
    assert _rows(src.read()) == before
    assert wap.publish() is None  # caught up — dead range never re-read
