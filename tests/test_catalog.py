"""TableCatalog: cross-table snapshot consistency — unpublished
member commits invisible, publish atomic, catalog time travel,
concurrent-publish conflict."""

from __future__ import annotations

import pytest

from data_mastery_pipeline_spark.catalog import (
    CatalogConflictError,
    TableCatalog,
)
from data_mastery_pipeline_spark.sources.txlog import TxTable

DDL = "k long, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _rows(t, **kw):
    return sorted(tuple(r) for r in t.collect())


@pytest.fixture()
def cat(spark, tmp_path):
    a = TxTable.create(spark, str(tmp_path / "a"), _df(spark, [(1, 10.0)]))
    b = TxTable.create(spark, str(tmp_path / "b"), _df(spark, [(1, 100.0)]))
    c = TableCatalog(spark, str(tmp_path / "cat"))
    c.register("a", a).register("b", b)
    c.publish()
    return c


def test_unpublished_commits_are_invisible(spark, cat):
    cat.table("a").append(_df(spark, [(2, 20.0)]))
    # table log sees it; catalog readers do not
    assert cat.table("a").read().count() == 2
    assert cat.read("a").count() == 1
    cat.publish()
    assert cat.read("a").count() == 2


def test_partial_multi_table_update_never_visible_together(spark, cat):
    """The consistency property itself: A commits, B commits, publish —
    a reader between the two table commits (via catalog) still sees
    the OLD pair; after publish it sees the NEW pair; never a mix."""
    cat.table("a").append(_df(spark, [(2, 20.0)]))
    # mid-flight: catalog pair is still (old A, old B)
    assert cat.read("a").count() == 1 and cat.read("b").count() == 1
    cat.table("b").append(_df(spark, [(2, 200.0)]))
    assert cat.read("a").count() == 1 and cat.read("b").count() == 1
    v = cat.publish()
    assert cat.read("a").count() == 2 and cat.read("b").count() == 2
    # catalog time travel: the previous snapshot still reads the old pair
    assert cat.read("a", catalog_version=v - 1).count() == 1
    assert cat.read("b", catalog_version=v - 1).count() == 1


def test_partial_publish_mapping(spark, cat):
    """publish({only A}) carries B forward at its pinned version."""
    cat.table("a").append(_df(spark, [(3, 30.0)]))
    cat.table("b").append(_df(spark, [(3, 300.0)]))
    cat.publish({"a": cat.table("a").version()})
    assert cat.read("a").count() == 2
    assert cat.read("b").count() == 1  # B's new commit unpublished
    with pytest.raises(KeyError):
        cat.publish({"nope": 1})


def test_concurrent_publish_conflicts(spark, cat):
    c2 = TableCatalog(cat.spark, cat.root)
    c2.register("a", cat.table("a")).register("b", cat.table("b"))
    # both observed version 0; first wins version 1, second conflicts
    cat.table("a").append(_df(cat.spark, [(9, 9.0)]))
    v1 = cat.version()
    payload_winner = cat.publish()
    assert payload_winner == v1 + 1
    import json, os

    # simulate the loser: it computed against the stale version
    with pytest.raises(CatalogConflictError):
        stale = c2.snapshot(v1)
        if not c2._put_if_absent(
            json.dumps({"mapping": stale, "delta": {}}),
            c2._path(v1 + 1),
        ):
            raise CatalogConflictError("lost")


def test_empty_catalog_raises(spark, tmp_path):
    c = TableCatalog(spark, str(tmp_path / "cat2"))
    with pytest.raises(LookupError):
        c.snapshot()
