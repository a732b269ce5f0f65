"""Transaction-log table format (sources/txlog.py): ACID commit
protocol, optimistic concurrency, stats pruning, time travel, vacuum.

The two-writers tests use two TxTable handles on one root — handles
hold no snapshot cache, so interleaving their calls models two real
concurrent committers up to the put-if-absent race itself, which is
exercised directly via _put_if_absent."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.sources.txlog import (
    ConflictError,
    TxTable,
    VersionExpiredError,
)

DDL = "k long, grp string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def test_create_append_read_roundtrip(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.append(_df(spark, [(3, "a", 3.0)]))
    assert _rows(t.read()) == [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)]
    # a second handle (fresh reader) sees the same committed state
    assert _rows(TxTable(spark, root).read()) == _rows(t.read())


def test_create_twice_conflicts(spark, root):
    TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    with pytest.raises(ConflictError):
        TxTable.create(spark, root, _df(spark, [(9, "z", 9.0)]))


def test_time_travel_and_history(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 2.0)]))
    t.delete_where("k", 1, 1)
    assert _rows(t.read(version=0)) == [(1, "a", 1.0)]
    assert _rows(t.read(version=1)) == [(1, "a", 1.0), (2, "b", 2.0)]
    assert _rows(t.read()) == [(2, "b", 2.0)]
    ops = [h["op"] for h in t.history()]
    assert ops == ["create", "append", "delete"]


def test_delete_where_blast_radius_and_null_semantics(spark, root):
    """Only stat-overlapping files are rewritten; untouched files stay
    BYTE-IDENTICAL on disk, and NULL predicate values never match."""
    t = TxTable.create(spark, root, _df(spark, [(1, "lo", 5.0), (2, "lo", None)]))
    t.append(_df(spark, [(3, "hi", 100.0)]))  # disjoint v-range file
    before = {
        a["path"]: (a["size"], os.path.getmtime(os.path.join(root, a["path"])))
        for a in t.snapshot_adds()
    }
    hi_files = {p for p in before if p not in {a["path"] for a in t.snapshot_adds(0)}}
    t.delete_where("v", 0.0, 10.0)
    after_paths = {a["path"] for a in t.snapshot_adds()}
    # the hi-range file survived untouched (same path, same bytes)
    assert hi_files <= after_paths
    for p in hi_files:
        assert os.path.getmtime(os.path.join(root, p)) == before[p][1]
    # NULL v row survives the delete (BETWEEN never matches NULL)
    assert _rows(t.read()) == [(2, "lo", None), (3, "hi", 100.0)]


def test_delete_no_overlap_is_metadata_noop(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    v = t.version()
    assert t.delete_where("v", 500.0, 600.0) == v  # no commit, no rewrite
    assert t.version() == v


def test_merge_upsert_update_insert_and_null_key_preserved(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (None, "n", 0.5)])
    )
    t.merge_upsert(_df(spark, [(2, "b", 20.0), (4, "d", 4.0)]), "k")
    assert _rows(t.read()) == [
        (1, "a", 1.0),
        (2, "b", 20.0),  # updated
        (4, "d", 4.0),  # inserted
        (None, "n", 0.5),  # NULL key: never matched, preserved (sorts last)
    ]


def test_merge_upsert_prunes_by_key_range(spark, root):
    """Files whose key stats are disjoint from the updates' range are
    not rewritten (same paths before and after)."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(1000, "z", 9.0)]))
    low_file = {a["path"] for a in t.snapshot_adds() if a["stats"]["k"][1] < 100}
    t.merge_upsert(_df(spark, [(1000, "z", 10.0)]), "k")
    assert low_file <= {a["path"] for a in t.snapshot_adds()}


def test_merge_upsert_guards(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    with pytest.raises(ValueError, match="duplicate"):
        t.merge_upsert(_df(spark, [(7, "x", 1.0), (7, "y", 2.0)]), "k")
    with pytest.raises(ValueError, match="NULL"):
        t.merge_upsert(_df(spark, [(None, "x", 1.0)]), "k")
    with pytest.raises(ValueError, match="stat column"):
        t.merge_upsert(_df(spark, [(7, "x", 1.0)]), "grp2")
    # empty updates: metadata no-op
    assert t.merge_upsert(_df(spark, []), "k") == t.version()


def test_optimize_compacts_preserves_rows_and_stats_metadata(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    for i in range(2, 6):
        t.append(_df(spark, [(i, "a", float(i))]))
    adds_before = t.snapshot_adds()
    rows_before = sum(a["num_records"] for a in adds_before)
    t.optimize(small_file_bytes=10 * 1024 * 1024, cluster_by="k")
    adds_after = t.snapshot_adds()
    assert len(adds_after) < len(adds_before)
    assert sum(a["num_records"] for a in adds_after) == rows_before  # metadata-level
    assert _rows(t.read()) == [(i, "a", float(i)) for i in range(1, 6)]
    assert [h["op"] for h in t.history()][-1] == "optimize"


def test_concurrent_append_append_retries_transparently(spark, root):
    """Two writers race on the same version: the loser's blind append
    retries at the next version — both rows land, no error."""
    t1 = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t2 = TxTable(spark, root)
    # t2 commits BETWEEN t1's snapshot resolve and t1's commit: simulate
    # by pre-claiming t1's target version with t2's real append
    t2.append(_df(spark, [(2, "b", 2.0)]))
    t1.append(_df(spark, [(3, "c", 3.0)]))  # lost race → retried
    assert _rows(t1.read()) == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]


def test_concurrent_overlapping_append_vs_delete_conflicts(spark, root):
    """A delete computed against a snapshot that a concurrent append
    then invalidated (new file overlaps the predicate) must raise."""
    t1 = TxTable.create(spark, root, _df(spark, [(1, "a", 5.0)]))
    t2 = TxTable(spark, root)
    rv = t1.version()
    meta, live, _, _ = t1._state_at(rv)
    hit = [a for a in live.values()]
    # t2's append lands first, with v inside t1's delete range
    t2.append(_df(spark, [(2, "b", 7.0)]))
    with pytest.raises(ConflictError, match="stale snapshot"):
        t1._commit("delete", [], [a["path"] for a in hit], {"v": (0.0, 10.0)}, rv)


def test_concurrent_disjoint_append_vs_delete_is_serializable(spark, root):
    """A concurrent append whose file stats are DISJOINT from the
    delete predicate does not conflict — the delete retries and
    commits; both effects land."""
    t1 = TxTable.create(spark, root, _df(spark, [(1, "a", 5.0), (2, "a", 6.0)]))
    t2 = TxTable(spark, root)
    rv = t1.version()
    meta, live, _, _ = t1._state_at(rv)
    # t1 prepares its delete rewrite (v in [0, 10] hits the only file)
    src = t1.read(version=rv).filter(
        ~F.coalesce((F.col("v") >= 0.0) & (F.col("v") <= 10.0), F.lit(False))
    )
    adds = t1._write_stage(src, meta["stat_cols"])
    # t2 appends far outside the predicate range
    t2.append(_df(spark, [(3, "z", 1000.0)]))
    v = t1._commit("delete", adds, [a["path"] for a in live.values()],
                   {"v": (0.0, 10.0)}, rv)
    assert v == t1.version()
    assert _rows(t1.read()) == [(3, "z", 1000.0)]


def test_concurrent_remove_remove_conflicts(spark, root):
    """Two transactions rewriting the same file: the loser must raise,
    whatever its op (here: two optimizes)."""
    t1 = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t1.append(_df(spark, [(2, "a", 2.0)]))
    t2 = TxTable(spark, root)
    rv = t1.version()
    _, live, _, _ = t1._state_at(rv)
    removes = [a["path"] for a in live.values()]
    t2.optimize(small_file_bytes=10 * 1024 * 1024)  # t2 wins
    with pytest.raises(ConflictError, match="also rewrites"):
        t1._commit("optimize", [], removes, None, rv)


def test_crash_orphan_invisible_then_vacuumed(spark, root):
    """A writer that staged data but never committed leaves files that
    (a) no read ever sees, (b) vacuum deletes after the retention age,
    while every referenced file survives."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    meta, _, _, _ = t._state_at(t.version())
    orphans = t._write_stage(_df(spark, [(99, "x", 9.0)]), meta["stat_cols"])
    assert _rows(t.read()) == [(1, "a", 1.0)]  # invisible
    assert t.vacuum(retention_sec=3600.0) == []  # too young: kept
    removed = t.vacuum(retention_sec=0.0)
    referenced = {a["path"] for a in t.snapshot_adds()}
    assert {a["path"] for a in orphans} <= set(removed)
    assert not referenced & set(removed)
    assert not os.path.isdir(
        os.path.join(root, os.path.dirname(orphans[0]["path"]))
    )  # the whole orphan stage dir is gone
    assert _rows(t.read()) == [(1, "a", 1.0)]  # referenced data intact


def test_vacuum_spares_young_empty_staging_dir(spark, root):
    """An in-flight writer's JUST-created staging dir (committer
    scaffolding present, no part file flushed yet) must survive a
    retention-gated vacuum — the empty-dir cleanup pass applies the
    same age gate as the file-unlink pass (ADVICE r6). Once past
    retention it is reaped like any orphan."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    stage = os.path.join(root, "data", "txn-inflight-test")
    os.makedirs(stage)
    with open(os.path.join(stage, "_started"), "w") as f:
        f.write("")
    t.vacuum(retention_sec=3600.0)
    assert os.path.isdir(stage), "young staging dir was rmtree'd mid-write"
    t.vacuum(retention_sec=0.0)
    assert not os.path.isdir(stage)  # aged out: reaped with its markers


def test_checkpoint_replay_equivalence_and_expire(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(0, "a", 0.0)]))
    for i in range(1, 13):  # crosses the interval-10 checkpoint
        t.append(_df(spark, [(i, "a", float(i))]))
    ckpts = [n for n in os.listdir(os.path.join(root, "_txlog")) if "ckpt" in n]
    assert ckpts, "interval checkpoint was not written"
    expected = [(i, "a", float(i)) for i in range(13)]
    # a FRESH handle replays through the checkpoint path
    assert _rows(TxTable(spark, root).read()) == expected
    # expire everything but the last 2 versions
    dropped = t.expire(keep_last=2)
    assert dropped and max(dropped) == t.version() - 2
    assert _rows(t.read()) == expected  # live read unaffected
    with pytest.raises(VersionExpiredError):
        t.read(version=min(dropped) - 1 if min(dropped) > 0 else 0)


def test_scan_prunes_files_by_log_stats(spark, root):
    """Range-clustered appends → a needle scan opens a strict subset of
    files and returns exactly the full-scan-filtered rows."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    for lo in (10, 20, 30):
        t.append(_df(spark, [(lo + j, "a", float(lo + j)) for j in range(5)]))
    df, stats = t.scan({"v": (20.0, 24.0)})
    assert stats["files_read"] < stats["files_total"]
    expect = _rows(t.read().filter((F.col("v") >= 20.0) & (F.col("v") <= 24.0)))
    assert _rows(df) == expect


def test_schema_drift_raises_loudly(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    with pytest.raises(ValueError, match="schema drift"):
        t.append(spark.createDataFrame([(2, "b")], "k long, grp string"))
    with pytest.raises(ValueError, match="schema drift on"):
        t.append(spark.createDataFrame([(2, "b", 2)], "k long, grp string, v long"))


def test_put_if_absent_is_exclusive(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    target = os.path.join(root, "_txlog", "claim.json")
    assert t._put_if_absent("x", target) is True
    assert t._put_if_absent("y", target) is False
    with open(target) as f:
        assert f.read() == "x"  # the winner's payload, untouched
    os.unlink(target)


def test_empty_table_after_full_delete(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.delete_where("k", 0, 100)
    df = t.read()
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "grp", "v"]
    # and the table accepts appends again
    t.append(_df(spark, [(5, "e", 5.0)]))
    assert _rows(t.read()) == [(5, "e", 5.0)]


def test_log_payload_shape(spark, root):
    """The commit file is line-JSON with remove-before-add and a
    trailing commit info — the replay contract."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.delete_where("k", 1, 1)
    path = os.path.join(root, "_txlog", f"{t.version():020d}.json")
    kinds = [next(iter(json.loads(line))) for line in open(path) if line.strip()]
    assert kinds[0] == "remove" and kinds[-1] == "commit"


# -- streaming sink (txn watermark) and real concurrency ------------------


def test_stream_batch_idempotent_replay(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(0, "a", 0.0)]))
    v = t.append_stream_batch(_df(spark, [(1, "b", 1.0)]), "app1", 0)
    assert v is not None
    assert t.append_stream_batch(_df(spark, [(1, "b", 1.0)]), "app1", 0) is None
    assert t.append_stream_batch(_df(spark, [(2, "c", 2.0)]), "app1", 1) is not None
    # a LATE replay of an old batch after newer ones is still a no-op
    assert t.append_stream_batch(_df(spark, [(1, "b", 1.0)]), "app1", 0) is None
    assert t.last_stream_batch("app1") == 1
    assert t.last_stream_batch("other") is None
    # another app's batch 0 is independent
    assert t.append_stream_batch(_df(spark, [(3, "d", 3.0)]), "app2", 0) is not None
    assert _rows(t.read()) == [
        (0, "a", 0.0), (1, "b", 1.0), (2, "c", 2.0), (3, "d", 3.0)
    ]


def test_stream_batch_race_loser_aborts_in_commit_loop(spark, root):
    """Two concurrent attempts of ONE batch both pass the pre-check;
    the put-if-absent loser must abort via the in-loop watermark
    re-check, not double-append."""
    from data_mastery_pipeline_spark.sources.txlog import _AlreadyCommitted

    t1 = TxTable.create(spark, root, _df(spark, [(0, "a", 0.0)]))
    t2 = TxTable(spark, root)
    rv = t2.version()
    meta, _, _, _ = t2._state_at(rv)
    # t2 stages its copy of batch 7 (pre-check passed, not yet committed)
    adds = t2._write_stage(_df(spark, [(1, "b", 1.0)]), meta["stat_cols"])
    # t1's attempt of the SAME batch wins the log race
    assert t1.append_stream_batch(_df(spark, [(1, "b", 1.0)]), "app", 7) is not None
    with pytest.raises(_AlreadyCommitted):
        t2._commit("append", adds, [], None, read_version=rv,
                   stream_txn=("app", 7))
    assert _rows(t1.read()) == [(0, "a", 0.0), (1, "b", 1.0)]  # once, not twice


def test_stream_watermark_survives_checkpoint_and_fresh_handle(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(0, "a", 0.0)]))
    for b in range(12):  # crosses the interval-10 log checkpoint
        t.append_stream_batch(_df(spark, [(100 + b, "s", float(b))]), "app", b)
    fresh = TxTable(spark, root)
    assert fresh.last_stream_batch("app") == 11
    assert fresh.append_stream_batch(_df(spark, [(999, "x", 9.0)]), "app", 11) is None


def test_foreach_batch_sink_full_redelivery_is_noop(spark, root, tmp_path):
    """A real Structured Streaming drain into the txlog sink, then the
    ENTIRE stream re-delivered (fresh stream checkpoint, same batch
    ids): the second drain must change nothing — exactly-once at the
    table despite at-least-once delivery to foreachBatch."""
    src = tmp_path / "src"
    for i in range(3):
        _df(spark, [(i, "s", float(i))]).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    t = TxTable.create(spark, root, _df(spark, []))
    ddl = DDL

    def drain(ckpt: str):
        q = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/b*")
            .writeStream.foreachBatch(t.foreach_batch_sink("ingest"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain(str(tmp_path / "ckpt1"))
    after_first = _rows(t.read())
    assert after_first == [(0, "s", 0.0), (1, "s", 1.0), (2, "s", 2.0)]
    v_first = t.version()
    drain(str(tmp_path / "ckpt2"))  # fresh ckpt → batches 0..2 re-delivered
    assert _rows(t.read()) == after_first
    assert t.version() == v_first  # not even empty commits


def test_threaded_concurrent_appends_all_land(spark, root):
    """REAL races: 4 writer threads, 2 appends each, one shared log.
    Every append must land exactly once, versions must be contiguous."""
    import threading

    t0 = TxTable.create(spark, root, _df(spark, [(0, "z", 0.0)]))
    errs = []

    def writer(wid: int):
        try:
            h = TxTable(spark, root)
            for j in range(2):
                k = 10 * (wid + 1) + j
                h.append(_df(spark, [(k, f"w{wid}", float(k))]))
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errs
    assert t0.version() == 8  # create + 8 appends, contiguous
    got = _rows(t0.read())
    want = sorted(
        [(0, "z", 0.0)]
        + [(10 * (w + 1) + j, f"w{w}", float(10 * (w + 1) + j))
           for w in range(4) for j in range(2)]
    )
    assert got == want


# -- schema evolution (metadata transactions) -----------------------------


def test_alter_add_column_nulls_old_files_types_new_appends(spark, root):
    """ADD COLUMN rewrites nothing: pre-alter files read the new column
    as NULL; post-alter appends carry real values and the new column
    joins the stats index (prunable)."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.alter_add_column("score", "double")
    assert [f.name for f in t.schema().fields] == ["k", "grp", "v", "score"]
    # old-schema appends are now drift (the table moved on)
    with pytest.raises(ValueError, match="schema drift"):
        t.append(_df(spark, [(2, "b", 2.0)]))
    t.append(
        spark.createDataFrame(
            [(2, "b", 2.0, 0.9)], "k long, grp string, v double, score double"
        )
    )
    got = _rows(t.read().select("k", "score"))
    assert got == [(1, None), (2, 0.9)]  # pre-alter row: NULL-filled
    # the new column is stats-indexed on new files → prunable
    new_file = [a for a in t.snapshot_adds() if "score" in a["stats"]]
    assert len(new_file) == 1 and new_file[0]["stats"]["score"][:2] == [0.9, 0.9]
    # and scan() on it prunes the old (stats-less) file conservatively
    df, st = t.scan({"score": (0.5, 1.0)})
    assert st["files_total"] == 2 and _rows(df.select("k")) == [(2,)]


def test_alter_conflicts_with_concurrent_writer_and_vice_versa(spark, root):
    """Metadata serializes against everything: a txn planned under the
    old schema cannot commit over an interleaved alter, and two
    concurrent alters collide."""
    t1 = TxTable.create(spark, root, _df(spark, [(1, "a", 5.0)]))
    t2 = TxTable(spark, root)
    rv = t1.version()
    meta, live, _, _ = t1._state_at(rv)
    removes = [a["path"] for a in live.values()]
    t2.alter_add_column("extra", "long")  # lands first
    with pytest.raises(ConflictError, match="changed table metadata"):
        t1._commit("delete", [], removes, {"v": (0.0, 10.0)}, rv)
    # two alters racing: the loser conflicts (not silently doubled)
    rv2 = t1.version()
    t2.alter_add_column("m1", "double")
    with pytest.raises(ConflictError, match="changed table metadata"):
        t1._commit("alter", [], [], None, read_version=rv2,
                   meta={"schema_json": t1.schema().json(),
                         "stat_cols": ["k", "v"]})
    with pytest.raises(ValueError, match="already exists"):
        t1.alter_add_column("m1", "double")


def test_alter_survives_checkpoint_replay(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(0, "a", 0.0)]))
    t.alter_add_column("score", "double")
    for i in range(1, 12):  # cross the interval-10 checkpoint
        t.append(
            spark.createDataFrame(
                [(i, "a", float(i), i / 10.0)],
                "k long, grp string, v double, score double",
            )
        )
    fresh = TxTable(spark, root)
    assert "score" in [f.name for f in fresh.schema().fields]
    assert fresh.read().where(F.col("score").isNull()).count() == 1  # v0 row


def test_txlog_read_keeps_plan_discipline(spark, root):
    """The txlog read path is a plain enforced-schema parquet scan:
    column pruning and filter pushdown reach the files (the repo's
    plan-discipline contract applies to the new storage layer too)."""
    from data_mastery_pipeline_spark.plans import (
        pushed_filters,
        read_schema_columns,
    )

    t = TxTable.create(spark, root, _df(spark, [(i, "a", float(i)) for i in range(50)]))
    q = t.read().filter(F.col("v") > 10.0).select("k")
    cols = read_schema_columns(q)
    assert cols and all(set(c) <= {"k", "v"} for c in cols)  # grp pruned
    assert any("v" in pf for pf in pushed_filters(q))  # filter pushed
    # scan() composes the same way: residual filter is pushable too
    df, _ = t.scan({"v": (5.0, 20.0)})
    assert any("v" in pf for pf in pushed_filters(df.select("k", "v")))


# ---------------------------------------------------------- change feed


def _replay(base_df, feed_df, cols):
    """Signed-multiset replay: base + feed(+insert/−delete) → net rows.
    Returns (rows_with_net_1, offending) where offending is any row
    whose net copy-count is not in {0, 1} — the tests' data is
    key-unique, so a correct feed can never produce net>1 or net<0."""
    signed = feed_df.select(
        *cols,
        F.when(F.col("_change_type") == "insert", F.lit(1))
        .otherwise(F.lit(-1))
        .alias("w"),
    )
    base = base_df.select(*cols).withColumn("w", F.lit(1))
    net = (
        base.unionByName(signed)
        .groupBy(*cols)
        .agg(F.sum("w").alias("n"))
    )
    bad = net.filter(~F.col("n").isin(0, 1)).collect()
    rows = sorted(
        tuple(r)[:-1] for r in net.filter(F.col("n") == 1).collect()
    )
    return rows, bad


def test_changes_replay_reproduces_every_snapshot(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 12.0), (3, "a", 3.0)])
    )
    t.append(_df(spark, [(4, "b", 15.0), (5, "a", 5.0)]))
    t.delete_where("v", 10.0, 20.0)  # drops k=2 and k=4
    t.merge_upsert(
        _df(spark, [(3, "a", 30.0), (6, "c", 6.0)]), "k"
    )  # update k=3, insert k=6
    v_opt = t.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    cols = ["k", "grp", "v"]
    empty = spark.createDataFrame([], DDL)

    # full-history feed from empty reproduces the final snapshot
    feed = t.changes(-1)
    rows, bad = _replay(empty, feed, cols)
    assert not bad
    assert rows == _rows(t.read())

    # every intermediate range (a, b] applied to snapshot(a) gives
    # snapshot(b) — the contract consumers build incremental views on
    latest = t.version()
    for a in range(-1, latest):
        for b in range(a + 1, latest + 1):
            rows, bad = _replay(
                t.read(version=a) if a >= 0 else empty,
                t.changes(a, b),
                cols,
            )
            assert not bad, (a, b, bad)
            assert rows == _rows(t.read(version=b)), (a, b)

    # optimize is dataChange=false: its version never appears
    assert v_opt not in {
        r["_commit_version"]
        for r in feed.select("_commit_version").distinct().collect()
    }


def test_changes_shape_and_validation(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 2.0)]))
    t.delete_where("k", 1, 1)
    feed = t.changes(-1)
    assert feed.columns == ["k", "grp", "v", "_change_type", "_commit_version"]
    got = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in feed.collect()
    }
    assert got == {(1, "insert", 0), (2, "insert", 1), (1, "delete", 2)}
    # an empty range is a contract error; beyond-latest too
    with pytest.raises(ValueError):
        t.changes(3, 2)
    with pytest.raises(ValueError):
        t.changes(0, 99)
    # (start, start] of an existing version: empty frame, full schema
    assert t.changes(1, 1).count() == 0


def test_changes_expired_history_raises(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    for k in range(2, 6):
        t.append(_df(spark, [(k, "b", float(k))]))
    t.expire(keep_last=2)
    with pytest.raises(VersionExpiredError):
        t.changes(-1).collect()
    # the retained window still feeds
    assert t.changes(t.version() - 1).count() == 1


def test_changes_spans_alter_with_null_fill(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.alter_add_column("score", "double")
    t2 = TxTable(spark, root)
    t2.append(
        spark.createDataFrame([(2, "b", 2.0, 0.5)], DDL + ", score double")
    )
    feed = t.changes(-1)
    assert feed.columns == [
        "k", "grp", "v", "score", "_change_type", "_commit_version",
    ]
    by_k = {r["k"]: r["score"] for r in feed.collect()}
    assert by_k == {1: None, 2: 0.5}  # pre-alter file NULL-fills


# ------------------------------------------------------ streaming source


def _feed_stream(spark, root, **opts):
    from data_mastery_pipeline_spark.sources import txlog as _m

    _m.register(spark)
    r = spark.readStream.format("txlog_feed").option("root", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_stream_feed_drains_appends_and_resumes(spark, root, tmp_path):
    from data_mastery_pipeline_spark.streaming import core

    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 2.0)]))
    out = core.run_available_now(
        _feed_stream(spark, root), output_mode="append"
    )
    assert _rows(out) == [(1, "a", 1.0), (2, "b", 2.0)]

    # restart from a pinned checkpoint: only NEW commits are delivered
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    for _ in range(2):  # second run: no new commits → no new rows
        q = (
            _feed_stream(spark, root)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    assert _rows(spark.read.parquet(sink)) == [(1, "a", 1.0), (2, "b", 2.0)]
    t.append(_df(spark, [(3, "c", 3.0)]))
    q = (
        _feed_stream(spark, root)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _rows(spark.read.parquet(sink)) == [
        (1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0),
    ]


def test_stream_feed_on_change_modes(spark, root):
    from data_mastery_pipeline_spark.streaming import core

    # ONE create file (coalesce) so the delete's rewrite provably
    # touches the k=1 survivor — redeliver's re-emission is then exact,
    # not layout-dependent
    t = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 12.0)]).coalesce(1)
    )
    t.delete_where("v", 10.0, 20.0)  # non-append commit

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="non-append"):
        core.run_available_now(
            _feed_stream(spark, root), output_mode="append"
        )

    # skip: the rewrite commit is ignored wholesale — the stream shows
    # the ORIGINAL create rows only (Delta ignoreDeletes shape)
    out = core.run_available_now(
        _feed_stream(spark, root, on_change="skip"), output_mode="append"
    )
    assert _rows(out) == [(1, "a", 1.0), (2, "b", 12.0)]

    # redeliver: the rewrite's added files re-emit survivors
    # (at-least-once; duplicates by design — Delta ignoreChanges shape)
    out = core.run_available_now(
        _feed_stream(spark, root, on_change="redeliver"),
        output_mode="append",
    )
    assert _rows(out) == [(1, "a", 1.0), (1, "a", 1.0), (2, "b", 12.0)]


def test_stream_feed_starting_version_and_optimize_skipped(spark, root):
    from data_mastery_pipeline_spark.streaming import core

    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 2.0)]))
    t.append(_df(spark, [(3, "c", 3.0)]))
    t.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    # start after version 1: only the second append arrives; the
    # optimize rewrite (dataChange=false) is never delivered
    out = core.run_available_now(
        _feed_stream(spark, root, starting_version="1"),
        output_mode="append",
    )
    assert _rows(out) == [(3, "c", 3.0)]


def test_stream_feed_into_txlog_sink_exactly_once(spark, root, tmp_path):
    """Source + sink compose into a table-to-table incremental pipeline:
    the feed drains into a SECOND txlog table through the exactly-once
    foreachBatch sink; a full fresh-checkpoint re-delivery commits
    nothing new (txn watermarks dedupe the replay)."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 2.0)]))
    dst_root = str(tmp_path / "dst")
    dst = TxTable.create(
        spark, dst_root, spark.createDataFrame([], DDL)
    )

    def run(ckpt):
        q = (
            _feed_stream(spark, root)
            .select("k", "grp", "v")
            .writeStream.foreachBatch(dst.foreach_batch_sink("cdc_copy"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(str(tmp_path / "c1"))
    assert _rows(dst.read()) == [(1, "a", 1.0), (2, "b", 2.0)]
    v = dst.version()
    run(str(tmp_path / "c2"))  # fresh checkpoint: full re-delivery
    assert dst.version() == v  # zero new commits
    assert _rows(dst.read()) == [(1, "a", 1.0), (2, "b", 2.0)]


# ------------------------------------------------------ deletion vectors


def test_dv_delete_no_rewrite_accumulates_and_noops(spark, root):
    t = TxTable.create(
        spark,
        root,
        _df(spark, [(i, "g", float(i)) for i in range(10)]).repartition(2),
    )
    files0 = sorted(a["path"] for a in t.snapshot_adds())
    v1 = t.delete_where("v", 2.0, 4.0, mode="dv")
    assert _rows(t.read()) == [
        (i, "g", float(i)) for i in range(10) if not 2 <= i <= 4
    ]
    # merge-on-read: NO data file was rewritten
    assert sorted(a["path"] for a in t.snapshot_adds()) == files0
    assert sum(t.dv_stats().values()) == 3
    # overlapping second delete: already-deleted positions subtracted
    t.delete_where("v", 3.0, 6.0, mode="dv")
    assert sum(t.dv_stats().values()) == 5
    assert t.read().count() == 5
    # re-delete of a fully-covered range: NO new commit
    v_latest = t.version()
    assert t.delete_where("v", 2.0, 6.0, mode="dv") == v_latest
    assert t.version() == v_latest
    # time travel sees pre-delete state
    assert t.read(version=v1 - 1).count() == 10
    assert t.read(version=v1).count() == 7
    # NULL predicate semantics match rewrite mode: NULLs never match
    t.append(_df(spark, [(99, "g", None)]))
    t.delete_where("v", 0.0, 100.0, mode="dv")
    assert _rows(t.read()) == [(99, "g", None)]


def test_dv_scan_applies_vectors_and_stats_unchanged(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(i, "g", float(i)) for i in range(10)])
    )
    t.delete_where("v", 0.0, 3.0, mode="dv")
    df, stats = t.scan({"v": (0.0, 5.0)})
    assert _rows(df) == [(4, "g", 4.0), (5, "g", 5.0)]
    assert stats["files_read"] >= 1  # pruning still file-granular


def test_dv_rewrites_materialize_vectors(spark, root):
    t = TxTable.create(
        spark,
        root,
        _df(spark, [(i, "g", float(i)) for i in range(10)]).coalesce(1),
    )
    t.append(_df(spark, [(10, "h", 10.0), (11, "h", 11.0)]).coalesce(1))
    t.delete_where("v", 1.0, 2.0, mode="dv")
    before = _rows(t.read())
    # optimize compacts WITH vectors applied and retires them
    t.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    assert _rows(t.read()) == before
    assert t.dv_stats() == {}
    # a rewrite delete over a DV'd file must not resurrect rows
    t.delete_where("v", 6.0, 7.0, mode="dv")
    t.delete_where("v", 8.0, 9.0)  # rewrite mode, same file
    assert _rows(t.read()) == [
        (0, "g", 0.0),
        (3, "g", 3.0),
        (4, "g", 4.0),
        (5, "g", 5.0),
        (10, "h", 10.0),
        (11, "h", 11.0),
    ]
    assert t.dv_stats() == {}  # the rewrite retired the 6-7 vectors too


def test_dv_merge_does_not_resurrect(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]).coalesce(1)
    )
    t.delete_where("v", 1.0, 1.0, mode="dv")
    t.merge_upsert(_df(spark, [(2, "b", 20.0), (3, "c", 3.0)]), "k")
    assert _rows(t.read()) == [(2, "b", 20.0), (3, "c", 3.0)]
    assert t.dv_stats() == {}


def test_dv_concurrency_conflicts(spark, root):
    t1 = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 12.0)]).coalesce(1)
    )
    t2 = TxTable(spark, root)
    # interleaved DV delete vs rewrite of the same file: rewrite loses
    rv = t1.version()
    meta, live, _, dvs = t1._state_at(rv)
    t2.delete_where("v", 1.0, 1.0, mode="dv")
    schema = t1.schema()
    hit = [a["path"] for a in live.values()]
    keep = t1._read_files(schema, hit, dvs).filter("v < 100")
    adds = t1._write_stage(keep, meta["stat_cols"])
    with pytest.raises(ConflictError, match="deletion vectors"):
        t1._commit("delete", adds, hit, {"v": (0.0, 100.0)}, read_version=rv)
    # interleaved rewrite vs DV delete: the DV's positions are dead
    rv2 = t2.version()
    _, live2, _, dvs2 = t2._state_at(rv2)
    t1.delete_where("v", 10.0, 20.0)  # rewrite commits first
    with pytest.raises(ConflictError, match="removed"):
        t2._commit(
            "delete_dv",
            [],
            [],
            {"v": (12.0, 12.0)},
            read_version=rv2,
            dv={
                "paths": ["data/fake/dv.parquet"],
                "files": {sorted(live2)[0]: 1},
                "num_deleted": 1,
            },
            dv_targets=[sorted(live2)[0]],
        )


def test_dv_changes_feed_and_replay(spark, root):
    t = TxTable.create(
        spark,
        root,
        _df(spark, [(i, "g", float(i)) for i in range(8)]).repartition(2),
    )
    t.delete_where("v", 1.0, 2.0, mode="dv")  # v1: dv delete
    t.append(_df(spark, [(8, "h", 8.0)]))  # v2
    t.delete_where("v", 3.0, 3.0, mode="dv")  # v3
    t.delete_where("v", 4.0, 5.0)  # v4: rewrite delete over DV'd files
    t.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)  # v5
    feed = t.changes(-1)
    # the dv commits emit exactly their newly-deleted rows
    dv_deletes = {
        (r["k"], r["_commit_version"])
        for r in feed.filter("_change_type = 'delete'").collect()
        if r["_commit_version"] in (1, 3)
    }
    assert dv_deletes == {(1, 1), (2, 1), (3, 3)}
    # the rewrite's delete side is DV-adjusted: rows 1,2,3 do NOT
    # re-appear as deletes at v4 (they were no longer visible)
    v4_deletes = sorted(
        r["k"]
        for r in feed.filter(
            "_change_type = 'delete' AND _commit_version = 4"
        ).collect()
    )
    assert 1 not in v4_deletes and 3 not in v4_deletes
    # full replay equality across every version pair
    cols = ["k", "grp", "v"]
    empty = spark.createDataFrame([], DDL)
    latest = t.version()
    for a in range(-1, latest):
        for b in range(a + 1, latest + 1):
            base = t.read(version=a) if a >= 0 else empty
            signed = t.changes(a, b).select(
                *cols,
                F.when(F.col("_change_type") == "insert", F.lit(1))
                .otherwise(F.lit(-1))
                .alias("w"),
            )
            net = (
                base.select(*cols)
                .withColumn("w", F.lit(1))
                .unionByName(signed)
                .groupBy(*cols)
                .agg(F.sum("w").alias("n"))
            )
            assert net.filter(~F.col("n").isin(0, 1)).count() == 0, (a, b)
            got = sorted(
                tuple(r)[:-1] for r in net.filter(F.col("n") == 1).collect()
            )
            assert got == _rows(t.read(version=b)), (a, b)


def test_restore_roundtrip_history_and_cdf_replay(spark, root):
    """RESTORE TO VERSION: the next version reads exactly like the
    target; history stays intact (restore the restore works); CDF
    multiset replay stays exact across the restore commit, including
    when deletion-vector state differs between the snapshots."""
    t = TxTable.create(
        spark,
        root,
        _df(spark, [(i, "g", float(i)) for i in range(8)]).repartition(2),
    )
    t.append(_df(spark, [(8, "h", 8.0)]))  # v1
    t.delete_where("v", 1.0, 2.0, mode="dv")  # v2: DV state appears
    t.update_where("v", 6.0, 6.0, {"v": "v + 0.5"}, mode="dv")  # v3
    snap = {v: _rows(t.read(version=v)) for v in range(4)}
    v = t.restore(1)  # DV state differs → full remove+re-add+dv diff
    assert v == 4 and _rows(t.read()) == snap[1]
    assert _rows(t.read(version=3)) == snap[3]  # history intact
    t.restore(3)  # restore forward again ("restore the restore")
    assert _rows(t.read()) == snap[3]
    assert t.restore(t.version()) == t.version()  # no-op at head
    # CDF replay equality across every pair spanning the restores
    cols = ["k", "grp", "v"]
    empty = spark.createDataFrame([], DDL)
    latest = t.version()
    for a in range(-1, latest):
        for b in range(a + 1, latest + 1):
            base = t.read(version=a) if a >= 0 else empty
            rows, bad = _replay(base, t.changes(a, b), cols)
            assert not bad, (a, b, bad)
            assert rows == _rows(t.read(version=b)), (a, b)


def test_restore_conflicts_with_concurrent_append(spark, root):
    t1 = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t1.append(_df(spark, [(2, "b", 2.0)]))
    t2 = TxTable(spark, root)
    # t2 plans a restore to v0, t1 appends first — the append's rows
    # surviving a restore would violate snapshot semantics → conflict
    rv = t2.version()
    meta_v, live_v, _, _ = t2._state_at(0)
    _, live_now, _, _ = t2._state_at(rv)
    t1.append(_df(spark, [(3, "c", 3.0)]))
    with pytest.raises(ConflictError, match="overlapping|added"):
        t2._commit(
            "restore",
            [live_v[p] for p in sorted(set(live_v) - set(live_now))],
            sorted(set(live_now) - set(live_v)),
            None,
            read_version=rv,
        )


def test_restore_conflicts_with_concurrent_dv_commit(spark, root):
    """A dv-only commit interleaving a restore must conflict even when
    it touches no file the restore rewrites: the restore's snapshot
    diff was computed against the pre-dv state, so the deletions would
    silently survive and the table would not read like the target
    version (review r7)."""
    t1 = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    )
    t1.append(_df(spark, [(3, "c", 3.0)]))  # v1
    t2 = TxTable(spark, root)
    rv = t2.version()
    _, live_v, _, _ = t2._state_at(0)
    _, live_now, _, _ = t2._state_at(rv)
    t1.delete_where("v", 1.0, 1.0, mode="dv")  # interleaved dv on v0's file
    with pytest.raises(ConflictError, match="restores over|deletion vectors"):
        t2._commit(
            "restore",
            [],
            sorted(set(live_now) - set(live_v)),
            None,
            read_version=rv,
        )


def test_restore_conflicts_with_concurrent_remove_only_commit(spark, root):
    """A rewrite-mode delete that fully EMPTIES a file (removes, no
    adds, no dv) on a file present in both snapshots — one the restore
    keeps untouched — must conflict: the restore's diff omits kept
    files, so the committed restore would silently read without the
    deleted file's rows and not match the target version (ADVICE r7)."""
    t1 = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t1.append(_df(spark, [(2, "b", 2.0)]))  # v1: restore-to-v0 removes this
    t2 = TxTable(spark, root)
    rv = t2.version()
    _, live_v, _, _ = t2._state_at(0)
    _, live_now, _, _ = t2._state_at(rv)
    # interleaved delete empties v0's only file: remove-only commit on
    # a file in live_v ∩ live_now (NOT in the restore's removes)
    t1.delete_where("v", 1.0, 1.0)
    assert t1.read().count() == 1  # the file really was fully removed
    with pytest.raises(ConflictError, match="restores over|removed"):
        t2._commit(
            "restore",
            [live_v[p] for p in sorted(set(live_v) - set(live_now))],
            sorted(set(live_now) - set(live_v)),
            None,
            read_version=rv,
        )


def test_vacuum_reaps_dir_it_just_emptied(spark, root):
    """Unlinking the last parquet bumps the txn dir's mtime — the dir
    cleanup must not treat that as fresh activity and strand the empty
    stage for another retention window (review r7): a dir THIS run
    emptied is reaped in the same run."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    meta, _, _, _ = t._state_at(t.version())
    orphans = t._write_stage(_df(spark, [(9, "x", 9.0)]), meta["stat_cols"])
    stage_dir = os.path.join(
        root, os.path.dirname(orphans[0]["path"])
    )
    # age the orphan parquet past retention; the dir mtime will be
    # bumped to NOW by the unlink itself
    past = time.time() - 7200
    for dp, _, fs in os.walk(stage_dir):
        for f in fs:
            os.utime(os.path.join(dp, f), (past, past))
    os.utime(stage_dir, (past, past))
    removed = t.vacuum(retention_sec=3600.0)
    assert removed, "aged orphan parquet was not reaped"
    assert not os.path.isdir(stage_dir), (
        "dir emptied by this vacuum run survived it"
    )


def test_restore_refuses_unreachable_target(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.delete_where("v", 1.0, 1.0)  # v1 rewrites away v0's file
    t.append(_df(spark, [(2, "b", 2.0)]))  # v2
    # (a) expired history: the target version itself is not replayable
    t.expire(keep_last=1)
    with pytest.raises(VersionExpiredError):
        t.restore(0)
    # (b) replayable version whose file was lost out-of-band (manual
    # delete / vacuum bug): the missing-file guard raises BEFORE any
    # commit lands, naming the vacuum caveat
    t2 = TxTable.create(
        spark, str(root) + "_b", _df(spark, [(1, "a", 1.0)])
    )
    t2.delete_where("v", 1.0, 1.0)  # v1
    victim = t2._state_at(0)[1]
    os.unlink(
        os.path.join(t2.root, next(iter(victim)))
    )
    with pytest.raises(FileNotFoundError, match="vacuum"):
        t2.restore(0)
    assert t2.version() == 1  # nothing committed


def test_restore_preserves_stream_watermarks(spark, root):
    """Exactly-once guards must SURVIVE a restore — a replayed batch
    after restore would double-apply if the txn watermark rolled back."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t.append_stream_batch(_df(spark, [(2, "b", 2.0)]), "app", 7)
    t.restore(0)
    assert t.last_stream_batch("app") == 7
    assert _rows(t.read()) == [(1, "a", 1.0)]


def test_dv_stream_feed_fails_then_skips(spark, root):
    from data_mastery_pipeline_spark.sources import txlog as _m
    from data_mastery_pipeline_spark.streaming import core

    t = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    )
    t.delete_where("v", 1.0, 1.0, mode="dv")
    _m.register(spark)

    def stream(**opts):
        r = spark.readStream.format("txlog_feed").option("root", root)
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="non-append"):
        core.run_available_now(stream(), output_mode="append")
    out = core.run_available_now(
        stream(on_change="skip"), output_mode="append"
    )
    assert _rows(out) == [(1, "a", 1.0), (2, "b", 2.0)]


def test_dv_vacuum_keeps_referenced_sidecars(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(i, "g", float(i)) for i in range(6)])
    )
    t.delete_where("v", 1.0, 2.0, mode="dv")
    # only zero-record staging orphans may go; every sidecar the dv
    # action references must survive (reaping one resurrects rows)
    removed = t.vacuum(retention_sec=0.0)
    _, _, _, dvs = t._state_at(t.version())
    referenced = {p for e in dvs.values() for p in e["paths"]}
    assert not (set(removed) & referenced)
    assert t.read().count() == 4
    # checkpoint + expire keeps DV state replayable from the checkpoint
    t.expire(keep_last=1)
    assert t.read().count() == 4
    assert sum(t.dv_stats().values()) == 2


# --------------------------------------------------------------- update


def test_update_where_rewrite_mode(spark, root):
    t = TxTable.create(
        spark,
        root,
        _df(spark, [(i, "g", float(i)) for i in range(6)] + [(9, "g", None)]),
    )
    t.update_where(
        "v", 2.0, 4.0, {"v": F.col("v") * 10, "grp": F.lit("upd")}
    )
    assert _rows(t.read()) == [
        (0, "g", 0.0),
        (1, "g", 1.0),
        (2, "upd", 20.0),
        (3, "upd", 30.0),
        (4, "upd", 40.0),
        (5, "g", 5.0),
        (9, "g", None),  # NULL predicate never matches (ANSI UPDATE)
    ]
    with pytest.raises(ValueError, match="unknown update columns"):
        t.update_where("v", 0.0, 1.0, {"nope": "1"})


def test_update_where_dv_mode_no_rewrite_and_cdf(spark, root):
    t = TxTable.create(
        spark,
        root,
        _df(spark, [(i, "g", float(i)) for i in range(6)]).repartition(2),
    )
    files0 = set(a["path"] for a in t.snapshot_adds())
    v1 = t.update_where("v", 2.0, 3.0, {"v": "v * 10"}, mode="dv")
    # merge-on-read: originals intact, updated rows in NEW files
    assert files0 <= set(a["path"] for a in t.snapshot_adds())
    assert sum(t.dv_stats().values()) == 2
    assert _rows(t.read()) == [
        (0, "g", 0.0),
        (1, "g", 1.0),
        (2, "g", 20.0),
        (3, "g", 30.0),
        (4, "g", 4.0),
        (5, "g", 5.0),
    ]
    # the re-updated row lives in a new file; updating it again works
    t.update_where("v", 20.0, 20.0, {"v": "v + 1.0"}, mode="dv")
    assert (2, "g", 21.0) in _rows(t.read())
    # time travel straddles the updates
    assert _rows(t.read(version=v1 - 1)) == [
        (i, "g", float(i)) for i in range(6)
    ]
    # CDF: one commit version carries BOTH the old values as deletes
    # and the new as inserts; replay reproduces every snapshot pair
    feed = t.changes(-1)
    v1_rows = {
        (r["k"], r["v"], r["_change_type"])
        for r in feed.filter(F.col("_commit_version") == v1).collect()
    }
    assert v1_rows == {
        (2, 2.0, "delete"),
        (3, 3.0, "delete"),
        (2, 20.0, "insert"),
        (3, 30.0, "insert"),
    }
    cols = ["k", "grp", "v"]
    empty = spark.createDataFrame([], DDL)
    latest = t.version()
    for a in range(-1, latest):
        for b in range(a + 1, latest + 1):
            base = t.read(version=a) if a >= 0 else empty
            signed = t.changes(a, b).select(
                *cols,
                F.when(F.col("_change_type") == "insert", F.lit(1))
                .otherwise(F.lit(-1))
                .alias("w"),
            )
            net = (
                base.select(*cols)
                .withColumn("w", F.lit(1))
                .unionByName(signed)
                .groupBy(*cols)
                .agg(F.sum("w").alias("n"))
            )
            assert net.filter(~F.col("n").isin(0, 1)).count() == 0, (a, b)
            got = sorted(
                tuple(r)[:-1] for r in net.filter(F.col("n") == 1).collect()
            )
            assert got == _rows(t.read(version=b)), (a, b)


def test_update_where_dv_noop_and_optimize_materializes(spark, root):
    t = TxTable.create(
        spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]).repartition(2)
    )
    v = t.version()
    # no stat overlap → no commit at all
    assert t.update_where("v", 50.0, 60.0, {"v": "v + 1"}, mode="dv") == v
    t.update_where("v", 2.0, 2.0, {"v": "v * 2"}, mode="dv")
    t.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    assert t.dv_stats() == {}
    assert _rows(t.read()) == [(1, "a", 1.0), (2, "b", 4.0)]


def test_update_where_bad_assignment_fails_without_committing(spark, root):
    """A mistyped assignment fails loudly — as Spark's runtime cast
    error during staging (coercible literal) or an AnalysisException
    (uncoercible when/otherwise branch types); either way NOTHING
    commits."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    v = t.version()
    with pytest.raises(Exception):
        t.update_where("v", 0.0, 2.0, {"v": F.lit("not-a-double")})
    with pytest.raises(Exception):
        t.update_where("v", 0.0, 2.0, {"grp": F.create_map()})
    assert t.version() == v


# --------------------------------------------------------- streaming CDC


def test_stream_cdf_equals_batch_changes(spark, root):
    from data_mastery_pipeline_spark.streaming import core

    t = TxTable.create(
        spark,
        root,
        _df(spark, [(i, "g", float(i)) for i in range(8)]).repartition(2),
    )
    t.delete_where("v", 1.0, 2.0, mode="dv")
    t.append(_df(spark, [(8, "h", 8.0)]))
    t.update_where("v", 3.0, 4.0, {"v": "v * 10"}, mode="dv")
    t.delete_where("v", 5.0, 6.0)  # rewrite over DV'd files
    t.optimize(small_file_bytes=1 << 30, target_file_bytes=1 << 20)
    out = core.run_available_now(
        _feed_stream(spark, root, mode="cdf"), output_mode="append"
    )
    assert _rows(out) == _rows(t.changes(-1))
    # the streamed feed replays from empty to the final snapshot
    net = out.groupBy("k", "grp", "v").agg(
        F.sum(
            F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        ).alias("n")
    )
    assert net.filter(~F.col("n").isin(0, 1)).count() == 0
    assert net.filter("n = 1").count() == t.read().count()


def test_stream_cdf_resumes_with_only_new_changes(spark, root, tmp_path):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")

    def drain():
        q = (
            _feed_stream(spark, root, mode="cdf")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    t.delete_where("v", 1.0, 1.0, mode="dv")
    drain()
    got = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {
        (1, "insert", 0),
        (2, "insert", 0),
        (1, "delete", 1),  # exactly once, from the resumed offset
    }


def test_stream_cdf_expired_start_rules(spark, root):
    from data_mastery_pipeline_spark.streaming import core

    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    for k in range(2, 6):
        t.append(_df(spark, [(k, "b", float(k))]))
    t.expire(keep_last=2)
    # append-only retained window: CDC streams fine from a mid offset
    out = core.run_available_now(
        _feed_stream(
            spark, root, mode="cdf", starting_version=str(t.version() - 1)
        ),
        output_mode="append",
    )
    assert out.count() == 1
    # a rewrite in range with the pre-start DV state expired: loud error
    t.delete_where("v", 1.0, 10.0)
    t.expire(keep_last=1)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        core.run_available_now(
            _feed_stream(spark, root, mode="cdf", starting_version="0"),
            output_mode="append",
        )


# ------------------------------------- constraints & timestamp travel


def test_check_constraint_lifecycle(spark, root):
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.add_constraint("v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("v_nonneg", "v >= 0")
    # NULL passes (ANSI CHECK); valid rows pass
    t.append(_df(spark, [(3, "c", 3.0), (4, "d", None)]))
    assert t.read().count() == 4
    # a violating batch fails INSIDE the staging write; nothing commits
    v = t.version()
    with pytest.raises(Exception, match="v_nonneg"):
        t.append(_df(spark, [(5, "e", -1.0)]))
    assert t.version() == v and t.read().count() == 4
    # update and merge paths enforce too
    with pytest.raises(Exception, match="v_nonneg"):
        t.update_where("v", 3.0, 3.0, {"v": "v - 100"})
    with pytest.raises(Exception, match="v_nonneg"):
        t.merge_upsert(_df(spark, [(1, "a", -5.0)]), "k")
    assert t.version() == v
    # dirty-data add is rejected with a count
    with pytest.raises(ValueError, match="existing rows violate"):
        t.add_constraint("v_big", "v > 100")
    # drop lifts enforcement; unknown drop is loud
    t.drop_constraint("v_nonneg")
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("v_nonneg")
    t.append(_df(spark, [(5, "e", -1.0)]))
    assert t.read().count() == 5


def test_check_constraint_serializes_and_survives_checkpoint(spark, root):
    t1 = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    t2 = TxTable(spark, root)
    # a writer that planned BEFORE the constraint must re-plan under it
    rv = t1.version()
    meta, _, _, _ = t1._state_at(rv)
    adds = t1._write_stage(_df(spark, [(2, "b", -9.0)]), meta["stat_cols"])
    t2.add_constraint("v_nonneg", "v >= 0")
    with pytest.raises(ConflictError, match="metadata"):
        t1._commit("append", adds, [], None, read_version=rv)
    # constraint state survives checkpointed replay
    t1.expire(keep_last=1)
    with pytest.raises(Exception, match="v_nonneg"):
        TxTable(spark, root).append(_df(spark, [(3, "c", -1.0)]))


def test_timestamp_time_travel(spark, root):
    import datetime
    import time as _time

    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    ts0 = _time.time()
    _time.sleep(0.05)
    t.append(_df(spark, [(2, "b", 2.0)]))
    assert t.version_at_timestamp(ts0) == 0
    assert _rows(t.read(as_of=ts0)) == [(1, "a", 1.0)]
    assert t.read(as_of=datetime.datetime.now()).count() == 2
    with pytest.raises(VersionExpiredError):
        t.version_at_timestamp(0.0)  # before the table existed
    with pytest.raises(ValueError, match="not both"):
        t.read(version=0, as_of=ts0)


# ------------------------------------------------------ Z-order optimize


def test_optimize_zorder_prunes_on_every_dimension(spark, root):
    """OPTIMIZE ZORDER BY (k, v): after the Morton-clustered rewrite, a
    needle on EITHER column prunes files through the log's stats index
    — the multi-dimension layout 1-D cluster_by can't give."""
    rows = [
        (x, "g", float(y)) for x in range(0, 64, 2) for y in range(0, 64, 2)
    ]
    t = TxTable.create(spark, root, _df(spark, rows).repartition(8))
    total_size = sum(a["size"] for a in t.snapshot_adds())
    t.optimize(
        small_file_bytes=1 << 30,
        target_file_bytes=max(1, total_size // 8),
        zorder_by=["k", "v"],
    )
    n_files = len(t.snapshot_adds())
    assert n_files >= 4  # enough files for pruning to be meaningful
    _, sk = t.scan({"k": (0, 7)})
    _, sv = t.scan({"v": (0.0, 7.0)})
    assert sk["files_read"] < sk["files_total"], sk
    assert sv["files_read"] < sv["files_total"], sv
    # row-identical to the pre-optimize table
    assert t.read().count() == len(rows)
    with pytest.raises(ValueError, match="not both"):
        t.optimize(cluster_by="k", zorder_by=["k", "v"])


def test_metadata_tables(spark, root):
    """files_df / history_df — the queryable metadata relations."""
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0), (2, "b", 9.0)]))
    t.append(_df(spark, [(3, "c", 3.0)]))
    t.delete_where("v", 9.0, 9.0, mode="dv")
    f = t.files_df()
    assert f.count() == len(t.snapshot_adds())
    assert f.agg(F.sum("dv_deleted")).collect()[0][0] == 1
    # stats ride along, queryable
    assert (
        f.filter(F.col("min_values")["k"] == "1").count() >= 1
    )
    h = t.history_df()
    assert [r["op"] for r in h.orderBy("version").collect()] == [
        "create",
        "append",
        "delete_dv",
    ]


def test_reserved_column_names_rejected(spark, root):
    with pytest.raises(ValueError, match="reserved"):
        TxTable.create(
            spark,
            root,
            spark.createDataFrame([(1, 2)], "k long, __pos long"),
        )
    t = TxTable.create(spark, root, _df(spark, [(1, "a", 1.0)]))
    with pytest.raises(ValueError, match="reserved"):
        t.alter_add_column("_change_type", "string")


# --------------------------------------------- incremental view (IVM)


def test_ivm_over_cdc_exact_and_exactly_once(spark, root, tmp_path):
    from data_mastery_pipeline_spark.streaming import ivm

    src = TxTable.create(
        spark,
        root,
        _df(spark, [(i, "g%d" % (i % 3), float(i)) for i in range(12)])
        .repartition(2),
    )
    src.delete_where("v", 2.0, 4.0, mode="dv")
    src.update_where("v", 8.0, 9.0, {"v": "v + 0.115"}, mode="dv")
    tgt = TxTable.create(
        spark,
        str(tmp_path / "tgt"),
        spark.createDataFrame([], ivm.mv_schema("grp", "string")),
    )

    def drain(ckpt):
        q = (
            _feed_stream(spark, root, mode="cdf")
            .writeStream.foreachBatch(
                ivm.foreach_batch_view_sink(tgt, "grp", "v", "mv1")
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def direct():
        return sorted(
            tuple(r)
            for r in src.read()
            .groupBy("grp")
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

    drain("c1")
    assert sorted(tuple(r) for r in ivm.current_view(tgt).collect()) == direct()
    # full fresh-checkpoint re-delivery: zero new target commits (the
    # merge txn watermark, not idempotence, carries exactly-once)
    v = tgt.version()
    drain("c2")
    assert tgt.version() == v
    # incremental drain: only the NEW commits apply
    src.append(_df(spark, [(20, "g0", 3.5), (21, "zz", 1.0)]))
    src.delete_where("v", 0.0, 1.0)  # rewrite delete; retracts g0+g1 rows
    drain("c1")
    assert sorted(tuple(r) for r in ivm.current_view(tgt).collect()) == direct()
    # a fully-retracted key leaves an n_rows=0 tombstone, hidden by the view
    src.delete_where("v", 1.0, 1.0)  # removes the only 'zz' row
    drain("c1")
    assert sorted(tuple(r) for r in ivm.current_view(tgt).collect()) == direct()
    assert tgt.read().filter("n_rows = 0").count() == 1
    # NULL-key change rows must NOT wedge the view: the delta excludes
    # them (merge_upsert rejects NULL update keys) and the view simply
    # carries no NULL group (ADVICE r6)
    src.append(
        spark.createDataFrame(
            [(30, None, 2.0), (31, "g0", 2.0)], src.read().schema
        )
    )
    drain("c1")  # would raise "NULL update keys" before the fix
    non_null_direct = sorted(
        tuple(r)
        for r in src.read()
        .filter(F.col("grp").isNotNull())
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(
                F.floor(F.col("v") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("sum_cents"),
        )
        .collect()
    )
    assert (
        sorted(tuple(r) for r in ivm.current_view(tgt).collect())
        == non_null_direct
    )
