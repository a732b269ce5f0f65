"""Versioned parquet tables: time travel, rollback, vacuum, atomic
pointer semantics (sources/versioned.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.sources import versioned


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vtable")


def _df(spark, *rows):
    return spark.createDataFrame(list(rows), "id long, v string")


def test_write_read_time_travel(spark, root):
    v1 = versioned.write_version(spark, root, _df(spark, (1, "a"), (2, "b")))
    v2 = versioned.write_version(spark, root, _df(spark, (1, "a2"), (3, "c")))
    assert (v1, v2) == (1, 2)
    # live read = latest
    live = {r["id"]: r["v"] for r in versioned.read_version(spark, root).collect()}
    assert live == {1: "a2", 3: "c"}
    # time travel = explicit version
    old = {r["id"]: r["v"] for r in versioned.read_version(spark, root, 1).collect()}
    assert old == {1: "a", 2: "b"}
    assert versioned.versions(spark, root) == [1, 2]


def test_rollback_is_append_only(spark, root):
    versioned.write_version(spark, root, _df(spark, (1, "good")))
    versioned.write_version(spark, root, _df(spark, (1, "BAD")))
    v3 = versioned.rollback(spark, root, to_version=1)
    assert v3 == 3
    live = versioned.read_version(spark, root).collect()
    assert [r["v"] for r in live] == ["good"]
    # the bad version remains inspectable (append-only history)
    assert versioned.versions(spark, root) == [1, 2, 3]
    bad = versioned.read_version(spark, root, 2).collect()
    assert [r["v"] for r in bad] == ["BAD"]


def test_vacuum_keeps_live_and_newest(spark, root):
    for i in range(1, 5):
        versioned.write_version(spark, root, _df(spark, (i, f"r{i}")))
    dropped = versioned.vacuum(spark, root, keep_last=2)
    assert dropped == [1, 2]
    assert versioned.versions(spark, root) == [3, 4]
    # live read unaffected
    assert versioned.read_version(spark, root).collect()[0]["id"] == 4
    # vacuumed snapshot is genuinely gone
    with pytest.raises(Exception):
        versioned.read_version(spark, root, 1).collect()


def test_snapshot_dirs_are_immutable(spark, root):
    versioned.write_version(spark, root, _df(spark, (1, "a")))
    # a second writer racing to the same version number errors instead
    # of clobbering (errorifexists on the snapshot dir)
    with pytest.raises(Exception):
        _df(spark, (9, "z")).write.mode("errorifexists").parquet(
            f"{root}/v=00001"
        )


def test_reader_never_sees_pointer_before_data(spark, root, monkeypatch):
    """The pointer is written AFTER the snapshot dir. Pinned by a SPY on
    _write_pointer that checks the snapshot is already complete
    (_SUCCESS on disk) at the MOMENT the pointer swings — a swapped
    write order fails here, which the old read-after-return test could
    never see (both artifacts exist by then; review r6, 9th pass)."""
    import os

    real = versioned._write_pointer
    seen: list[int] = []

    def spy(spark_, root_, version):
        assert os.path.exists(
            os.path.join(root_, f"v={version:05d}", "_SUCCESS")
        ), "pointer swung before the snapshot dir was complete"
        seen.append(version)
        return real(spark_, root_, version)

    monkeypatch.setattr(versioned, "_write_pointer", spy)
    versioned.write_version(spark, root, _df(spark, (1, "a")))
    assert seen == [1]  # the spy actually gated the swing
    for ver in versioned.versions(spark, root):
        # every version listed on disk is fully readable
        assert versioned.read_version(spark, root, ver).count() >= 1


def test_stream_to_versioned_table_time_travelable_history(spark, tmp_path):
    """foreachBatch + versioned tables: each micro-batch commits a NEW
    cumulative snapshot, so the stream's whole history is time-travelable
    (what a table-format streaming sink gives you, on plain parquet)."""
    from data_mastery_pipeline_spark.tables import load_table

    from conftest import SF_SMOKE

    ev = load_table(spark, "events", SF_SMOKE).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = tmp_path / "src"
    halves = [ev.filter(F.col("event_id") % 2 == i) for i in range(2)]
    for i, h in enumerate(halves):
        h.coalesce(1).write.parquet(str(src / f"b{i}"))

    root = str(tmp_path / "vtable")

    def commit_version(batch_df, _bid):
        try:
            prev = versioned.read_version(batch_df.sparkSession, root)
            cumulative = prev.unionByName(batch_df)
        except FileNotFoundError:
            cumulative = batch_df
        versioned.write_version(batch_df.sparkSession, root, cumulative)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
        .writeStream.foreachBatch(commit_version)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    vs = versioned.versions(spark, root)
    assert len(vs) == 2  # one snapshot per micro-batch
    # history is monotone and the final snapshot is the full table
    counts = [versioned.read_version(spark, root, v).count() for v in vs]
    assert counts == sorted(counts)
    assert counts[-1] == ev.count()
    # time travel into the stream's past: version 1 is exactly batch 0
    assert counts[0] == halves[0].count()


def test_write_version_skips_orphan_dir_from_crashed_writer(spark, root):
    """Review r6: a writer that died after creating its snapshot dir
    but before the pointer swing must not wedge every future write
    (errorifexists collision with the orphan forever)."""
    import os

    from data_mastery_pipeline_spark.sources import versioned as V

    df = spark.range(3).toDF("x")
    v1 = V.write_version(spark, root, df)
    # simulate the crash: v2's dir exists, pointer still at v1
    os.makedirs(f"{root}/v={v1 + 1:05d}", exist_ok=True)
    v_next = V.write_version(spark, root, df.withColumn("x", F.col("x") + 1))
    assert v_next == v1 + 2  # skipped past the orphan
    assert V.read_version(spark, root).count() == 3
    assert sorted(r["x"] for r in V.read_version(spark, root).collect()) == [1, 2, 3]
