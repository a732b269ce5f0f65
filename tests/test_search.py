"""SearchIndex (search.py): incremental postings/tombstone maintenance
equals a from-scratch rebuild after every DML shape — append, delete,
UPDATE (generation handling: fresh postings must outlive the tombstone
that kills their predecessors), vacuum_tombstones, replay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.search import SearchIndex
from data_mastery_pipeline_spark.sources.txlog import TxTable

DDL = "doc_id long, text string"

DOCS = [
    (1, "spark shuffles data across the cluster"),
    (2, "the index serves bm25 without a scan"),
    (3, "tombstones kill dead generations"),
    (4, "spark spark spark everywhere"),
    (5, "a short doc"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def stack(spark, tmp_path):
    src = TxTable.create(
        spark, str(tmp_path / "src"), _df(spark, DOCS), stat_cols=["doc_id"]
    )
    idx = SearchIndex.create(spark, src, str(tmp_path / "idx"))
    idx.refresh()
    return src, idx


def _served(idx, terms, k=10):
    return [
        (r["doc_id"], round(r["raw_score"], 9))
        for r in idx.query(terms, k).collect()
    ]


def _rebuilt(spark, src, tmp_path, terms, tag, k=10):
    fresh = SearchIndex.create(
        spark, src, str(tmp_path / f"rebuild_{tag}")
    )
    fresh.refresh()
    return _served(fresh, terms, k)


def test_backfill_and_basic_ranking(stack):
    src, idx = stack
    out = _served(idx, ["spark"])
    assert [d for d, _ in out] == [4, 1]  # tf=3 short doc first
    assert all(s > 0 for _, s in out)


def test_incremental_append_equals_rebuild(spark, tmp_path, stack):
    src, idx = stack
    src.append(_df(spark, [(6, "spark index spark")]))
    assert idx.refresh() is not None
    assert idx.refresh() is None  # replay no-op
    assert _served(idx, ["spark", "index"]) == _rebuilt(
        spark, src, tmp_path, ["spark", "index"], "append"
    )


def test_delete_tombstones_equal_rebuild(spark, tmp_path, stack):
    src, idx = stack
    src.delete_where("doc_id", 4, 4)
    idx.refresh()
    out = _served(idx, ["spark"])
    assert [d for d, _ in out] == [1]
    assert out == _rebuilt(spark, src, tmp_path, ["spark"], "delete")
    # corpus stats shrank with the delete (doc 4 out of N/avgdl)


def test_update_new_generation_outlives_tombstone(spark, tmp_path, stack):
    src, idx = stack
    # rewrite doc 5's text entirely: CDF emits delete(old)+insert(new)
    src.update_where(
        "doc_id", 5, 5, {"text": F.lit("spark now lives here")}
    )
    idx.refresh()
    out = _served(idx, ["spark"])
    assert 5 in [d for d, _ in out]  # new generation visible
    served_short = _served(idx, ["short"])
    assert served_short == []  # old generation dead
    assert out == _rebuilt(spark, src, tmp_path, ["spark"], "update")


def test_vacuum_tombstones_preserves_results(spark, tmp_path, stack):
    src, idx = stack
    src.delete_where("doc_id", 1, 2)
    src.update_where("doc_id", 3, 3, {"text": F.lit("fresh text")})
    idx.refresh()
    before = _served(idx, ["spark", "fresh", "tombstones"])
    folded = idx.vacuum_tombstones()
    assert folded["tombstones_folded"] > 0
    assert idx.tombstones.read().count() == 0
    after = _served(idx, ["spark", "fresh", "tombstones"])
    assert before == after
    # second vacuum is a no-op
    assert idx.vacuum_tombstones() == {"tombstones_folded": 0}


def test_rewrite_churn_nets_out(spark, tmp_path, stack):
    """optimize() rewrites files (delete+insert churn in the CDF);
    netting must keep the index refresh a no-op on content."""
    src, idx = stack
    for i in range(3):
        src.append(_df(spark, [(10 + i, "padding doc")]))
    src.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 30)
    idx.refresh()
    # incremental state == from-scratch rebuild: un-netted churn would
    # mint duplicate postings and inflate tf/df (N/avgdl changed with
    # the appends, so scores are compared to the rebuild, not to a
    # pre-append baseline)
    for terms in (["spark"], ["padding"]):
        assert _served(idx, terms) == _rebuilt(
            spark, src, tmp_path, terms, f"churn_{terms[0]}"
        )


def test_term_probe_prunes_postings_files(spark, tmp_path):
    # enough distinct terms that range-clustered postings span files
    # with disjoint term ranges
    rows = [
        (i, " ".join(f"w{j:03d}" for j in range(i % 37, i % 37 + 12)))
        for i in range(300)
    ]
    src = TxTable.create(
        spark, str(tmp_path / "src"), _df(spark, rows), stat_cols=["doc_id"]
    )
    idx = SearchIndex.create(spark, src, str(tmp_path / "idx"))
    idx.refresh()
    _, st = idx.postings.scan({"term": ("w010", "w010")})
    assert st["files_read"] < st["files_total"]


def test_query_for_absent_term_is_empty(stack):
    src, idx = stack
    assert _served(idx, ["zzzznotaterm"]) == []


def _crash_after_postings_leg(spark, src, idx):
    """Simulate a refresh that died after the postings commit but
    before doclens/tombstones: run ONLY the postings leg, advancing
    only the postings watermark. Returns the crashed-window version."""
    from data_mastery_pipeline_spark.functions import text as textfn

    want = src.version()
    last = idx.postings.last_stream_batch(idx._APP)
    have = -1 if last is None else last
    net = idx._net(src.changes(have, want))
    ins = net.filter(F.col("net") > 0)
    toks = textfn.tokens("text")
    rows = (
        ins.select(
            "doc_id",
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("gen", F.lit(want).cast("long"))
    )
    idx.postings.append_stream_batch(rows, idx._APP, want)
    assert idx.doclens.last_stream_batch(idx._APP) != want  # lagging
    return want


def test_crash_then_delete_before_resume(spark, tmp_path, stack):
    """A doc inserted in the crashed window and DELETED before the
    resume: the lagging tombstone leg's window spans insert+delete,
    which net to nothing — but the crashed postings commit is already
    durable. The two-phase resume must still tombstone it (repair
    phase folds exactly the crashed window), or the doc is served
    forever and vacuum bakes it in as live."""
    src, idx = stack
    src.append(_df(spark, [(7, "orphan spark doc")]))
    _crash_after_postings_leg(spark, src, idx)
    src.delete_where("doc_id", 7, 7)  # interleaved DML before resume
    idx.refresh()
    assert _served(idx, ["orphan"]) == []
    assert _served(idx, ["spark"]) == _rebuilt(
        spark, src, tmp_path, ["spark"], "crashdel"
    )
    # vacuum must not resurrect the orphaned postings
    idx.vacuum_tombstones()
    assert _served(idx, ["orphan"]) == []


def test_crash_then_reinsert_before_resume(spark, tmp_path, stack):
    """The symmetric hazard: a doc deleted in the crashed window and
    RE-INSERTED with identical text before the resume. Netting over
    the lagging legs' wide window cancels the pair — no tombstone —
    while the resumed postings leg adds fresh postings next to the
    still-live old generation, doubling tf/df. Two-phase resume keeps
    incremental == rebuild."""
    src, idx = stack
    src.delete_where("doc_id", 4, 4)
    src.append(_df(spark, [(8, "window filler")]))
    _crash_after_postings_leg(spark, src, idx)
    # interleaved DML: re-insert doc 4 with the SAME text
    src.append(_df(spark, [(4, "spark spark spark everywhere")]))
    idx.refresh()
    for terms in (["spark"], ["filler"]):
        assert _served(idx, terms) == _rebuilt(
            spark, src, tmp_path, terms, f"crashreins_{terms[0]}"
        )


def test_crash_between_table_commits_resumes_cleanly(spark, tmp_path, stack):
    """The exactly-once-per-table claim: if a refresh dies after the
    postings commit but before doclens/tombstones (simulated by
    advancing only the postings watermark), the NEXT refresh folds the
    lagging tables' windows without double-applying postings."""
    src, idx = stack
    src.append(_df(spark, [(7, "resume doc spark")]))
    want = src.version()

    # simulate the crash: run ONLY the postings leg of refresh()
    from pyspark.sql import functions as F
    from data_mastery_pipeline_spark.functions import text as textfn

    last = idx.postings.last_stream_batch(idx._APP)
    have = -1 if last is None else last  # NB: `or -1` would turn a
    # legitimate watermark of 0 into a full-history replay
    net = idx._net(src.changes(have, want))
    ins = net.filter(F.col("net") > 0)
    toks = textfn.tokens("text")
    rows = (
        ins.select(
            "doc_id",
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("gen", F.lit(want).cast("long"))
    )
    idx.postings.append_stream_batch(rows, idx._APP, want)
    assert idx.doclens.last_stream_batch(idx._APP) != want  # lagging

    # resume: refresh must advance doclens/tombstones, not re-append
    # postings (its watermark already covers the window)
    n_postings = idx.postings.read().count()
    assert idx.refresh() == want
    assert idx.postings.read().count() == n_postings  # no double-apply
    assert idx.doclens.last_stream_batch(idx._APP) == want
    assert idx.tombstones.last_stream_batch(idx._APP) == want
    # the index now equals a from-scratch rebuild
    assert _served(idx, ["resume", "spark"]) == _rebuilt(
        spark, src, tmp_path, ["resume", "spark"], "crashresume"
    )
