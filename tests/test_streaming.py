"""Multi-batch Structured Streaming semantics.

The oracle-parity suite checks streaming output against DuckDB with the
whole input in one micro-batch; these tests split input across many
micro-batches to exercise what single-batch runs can't: cross-batch
state, watermark advance, late-data drop, and replay-idempotent sinks.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from data_mastery_pipeline_spark import schemas
from data_mastery_pipeline_spark.streaming import core, sinks
from data_mastery_pipeline_spark.streaming import windows as swin
from data_mastery_pipeline_spark.streaming.dedup import dedup_within_watermark
from data_mastery_pipeline_spark.streaming.stateful import sessionize_users
from data_mastery_pipeline_spark.tables import load_table


@pytest.fixture(scope="module")
def staged_events(spark, tmp_path_factory):
    """Events split into 4 time-quartile files, written in time order so
    maxFilesPerTrigger=1 replays them as an in-order stream."""
    base = tmp_path_factory.mktemp("events_stream")
    ev = load_table(spark, "events", SF_SMOKE).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    qs = ev.approxQuantile("event_id", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    for i in range(4):
        part = ev.filter(
            (F.col("event_id") > bounds[i]) & (F.col("event_id") <= bounds[i + 1])
        )
        # one file per quartile; ordered names keep source order stable
        part.coalesce(1).write.parquet(str(base / f"batch_{i}"))
    return str(base), ev


def _stream_staged(spark, path: str):
    # ts here is already TimestampType (written by Spark above), unlike
    # the TIMESTAMP(NANOS) testdata files.
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{path}/batch_*")
    )


def test_multibatch_tumbling_equals_batch(spark, staged_events):
    path, ev = staged_events
    stream = _stream_staged(spark, path)
    got = core.run_available_now(
        swin.tumbling_value_stats(stream, window="1 hour", watermark="1 hour"),
        output_mode="complete",
    )
    want = swin.tumbling_value_stats(ev, window="1 hour")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_multibatch_stateful_sessions_equal_batch_islands(spark, staged_events):
    """applyInPandasWithState across 4 micro-batches: final per-user
    counters equal the batch gaps-and-islands computation."""
    path, ev = staged_events
    stream = _stream_staged(spark, path).select("ts", "user_id")
    out = core.run_available_now(
        sessionize_users(stream, state_ttl_ms=None), output_mode="update"
    )
    # update-mode memory sink appends one row per (user, batch); the final
    # state row per user is the one with the largest n_events.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )

    lag_w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(lag_w)
    want = (
        ev.withColumn("new_s", (gap.isNull() | (gap > 1800)).cast("long"))
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count("*").alias("n_events"))
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, want.collect()))


def test_multibatch_dedup_within_watermark(spark, staged_events):
    path, _ev = staged_events
    stream = _stream_staged(spark, path).select("ts", "user_id", "event_type")
    out = core.run_available_now(
        dedup_within_watermark(stream, ["user_id", "event_type"], delay="30 days"),
        output_mode="append",
    )
    # events span << 30 days: watermark never evicts state, so the result
    # is exactly one row per distinct key even across batches.
    n_keys = (
        load_table(spark, "events", SF_SMOKE)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert out.count() == n_keys
    assert out.select("user_id", "event_type").distinct().count() == n_keys


def test_watermark_drops_late_data(spark, tmp_path):
    """An event older than the advanced watermark is dropped from the
    aggregation — the semantics the reference lacks (SURVEY §2.J: late
    rows silently land in a later batch run)."""
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def mk(path, rows):
        spark.createDataFrame(
            [(ts, uid) for ts, uid in rows], "ts timestamp, user_id long"
        ).coalesce(1).write.parquet(path)

    import time

    # batch 0: events at 00:00 and 03:00 → watermark advances to 02:00
    mk(str(tmp_path / "batch_0"), [(t0, 1), (t0 + dt.timedelta(hours=3), 1)])
    time.sleep(1.2)  # file source orders batches by mtime
    # batch 1: on-time event (also gives the watermark a batch to apply —
    # Spark activates a new watermark one batch after computing it)
    mk(str(tmp_path / "batch_1"), [(t0 + dt.timedelta(hours=3, minutes=10), 1)])
    time.sleep(1.2)
    # batch 2: a 2.5h-late event (00:30 < watermark) → must be dropped
    mk(str(tmp_path / "batch_2"), [(t0 + dt.timedelta(minutes=30), 1)])
    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/batch_*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    # Append mode: a window emits (and its state evicts) once the
    # watermark passes its end; later rows for it are dropped. Complete
    # mode would keep all state and absorb the late row — the eviction is
    # exactly what makes 100 TB/day streams feasible.
    got = {
        (r["w"]["start"], r["n"]) for r in core.run_available_now(agg, "append").collect()
    }
    # The hour-00 window emits with ONLY its on-time event — the 00:30
    # row arriving in batch 2 is behind the 02:00 watermark and dropped
    # (numRowsDroppedByWatermark=1 in the progress log). The hour-03
    # window's end (04:00) never falls behind the watermark → never
    # emits in append mode.
    assert got == {(t0, 1)}


def test_idempotent_sink_absorbs_replay(spark, staged_events, tmp_path):
    """S8/S14: re-delivering the same micro-batch appends nothing."""
    path, ev = staged_events
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    stream = _stream_staged(spark, path)
    q = sinks.write_stream_idempotent(
        stream, target, ckpt, keys=["event_id"]
    ).start()
    q.awaitTermination()
    n1 = spark.read.parquet(target).count()
    assert n1 == ev.count()

    # replay: same data pushed again through the batch writer directly
    sinks.idempotent_append_batch(ev, target, keys=["event_id"])
    assert spark.read.parquet(target).count() == n1


def test_kafka_shaped_parse_handles_malformed(spark):
    """PERMISSIVE parse: malformed payloads yield null fields, messages
    are never dropped (the reference logs-and-skips, losing the row)."""
    from data_mastery_pipeline_spark.streaming.kafka import parse_json_records

    rows = [
        (b"k1", b'{"event_id": 1, "user_id": 7}', "t", 0, 0, dt.datetime(2026, 1, 1)),
        (b"k2", b"not json at all", "t", 0, 1, dt.datetime(2026, 1, 1)),
    ]
    kdf = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset long, timestamp timestamp",
    )
    out = parse_json_records(
        kdf, schema_of_events()
    ).select("event_id", "user_id", "_kafka_offset").collect()
    by_offset = {r["_kafka_offset"]: r for r in out}
    assert by_offset[0]["event_id"] == 1 and by_offset[0]["user_id"] == 7
    assert by_offset[1]["event_id"] is None  # malformed → nulls, row kept


def schema_of_events():
    from pyspark.sql import types as T

    return T.StructType([f for f in schemas.EVENTS.fields if f.name != "props"])


def test_rocksdb_state_store_matches_heap_provider(spark, staged_events):
    """Same stateful query (tumbling agg + stateful dedup) on the RocksDB
    state store provider — results identical to the default heap
    provider, proving the production large-state config works."""
    path, ev = staged_events
    with core.rocksdb_state(spark):
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == core.ROCKSDB_PROVIDER
        )
        stream = _stream_staged(spark, path)
        got = core.run_available_now(
            swin.tumbling_value_stats(stream, window="1 hour", watermark="1 hour"),
            output_mode="complete",
        )
        rows_agg = sorted(map(tuple, got.collect()))
        dedup = core.run_available_now(
            dedup_within_watermark(
                _stream_staged(spark, path).select("ts", "user_id", "event_type"),
                ["user_id", "event_type"],
                delay="30 days",
            ),
            output_mode="append",
        )
        n_dedup = dedup.count()
    # provider restored after the block
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
        )
        != core.ROCKSDB_PROVIDER
    )
    want = swin.tumbling_value_stats(ev, window="1 hour")
    assert rows_agg == sorted(map(tuple, want.collect()))
    n_keys = ev.select("user_id", "event_type").distinct().count()
    assert n_dedup == n_keys


def test_multibatch_stream_stream_interval_join(spark, staged_events):
    """Stream-stream time-bucket interval join across 4 micro-batches
    equals the batch join — including pairs whose click and purchase
    arrive in DIFFERENT micro-batches (the join state carries them)."""
    from data_mastery_pipeline_spark.streaming import joins as sjoins

    path, ev = staged_events
    clicks = (
        _stream_staged(spark, path)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("click_user"), F.col("ts").alias("click_ts"))
    )
    purchases = (
        _stream_staged(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("ts").alias("purchase_ts"))
    )
    out = core.run_available_now(
        sjoins.interval_join_streams(
            clicks, purchases, "click_ts", "purchase_ts", tolerance_seconds=120,
            watermark="10 minutes",
        ).select("click_user", "click_ts", "purchase_ts"),
        output_mode="append",
    )
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"), F.col("ts").alias("click_ts")
    )
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("purchase_ts")
    )
    want = bc.join(
        bp,
        F.abs(F.unix_micros("click_ts") - F.unix_micros("purchase_ts"))
        <= 120 * 1_000_000,
    )
    got_rows = sorted(map(tuple, out.collect()))
    want_rows = sorted(map(tuple, want.select("click_user", "click_ts", "purchase_ts").collect()))
    assert got_rows == want_rows and len(got_rows) > 0


def test_stream_stream_left_outer_interval_join(spark, staged_events):
    """LEFT OUTER stream-stream interval join: matched rows equal the
    inner join; clicks with no purchase within tolerance come out
    null-padded once the watermark passes them (the tail inside the
    final watermark horizon may legitimately stay unemitted)."""
    from data_mastery_pipeline_spark.streaming import joins as sjoins

    path, ev = staged_events

    def clicks_stream():
        return (
            _stream_staged(spark, path)
            .filter(F.col("event_type") == "click")
            .select(F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"))
        )

    purchases = (
        _stream_staged(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("ts").alias("purchase_ts"))
    )
    out = core.run_available_now(
        sjoins.interval_join_streams(
            clicks_stream(), purchases, "click_ts", "purchase_ts",
            tolerance_seconds=120, watermark="10 minutes", how="left_outer",
        ).select("click_id", "click_ts", "purchase_ts"),
        output_mode="append",
    )
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("purchase_ts")
    )
    cond = F.abs(F.unix_micros("click_ts") - F.unix_micros("purchase_ts")) <= 120_000_000

    got_matched = sorted(map(tuple, out.filter(F.col("purchase_ts").isNotNull()).collect()))
    want_matched = sorted(map(tuple, bc.join(bp, cond).select("click_id", "click_ts", "purchase_ts").collect()))
    assert got_matched == want_matched

    # null-padded = exactly a subset of the batch anti-join, and every
    # unmatched click safely older than the final watermark horizon is
    # present (horizon: max event time - watermark - tolerance).
    got_unmatched = {r["click_id"] for r in out.filter(F.col("purchase_ts").isNull()).collect()}
    batch_unmatched = {r["click_id"] for r in bc.join(bp, cond, "left_anti").collect()}
    assert got_unmatched <= batch_unmatched
    # the watermark the FINAL batch runs with was computed from the
    # batches before it, so anchor the horizon at the 3rd-quartile batch
    # boundary, not the global max event time
    import datetime as dt

    t75_us = ev.select(F.unix_micros("ts").alias("us")).approxQuantile("us", [0.75], 0.0)[0]
    t75 = dt.datetime.fromtimestamp(t75_us / 1e6)
    horizon = t75 - dt.timedelta(minutes=10 + 2 + 1)
    old_unmatched = {
        r["click_id"]
        for r in bc.join(bp, cond, "left_anti").filter(F.col("click_ts") < F.lit(horizon)).collect()
    }
    assert old_unmatched <= got_unmatched and len(old_unmatched) > 0


class _FakeGroupState:
    """Minimal GroupState double for unit-testing the fold's timeout
    branch without running the streaming engine (processing-time timers
    can't fire inside a deterministic availableNow drain)."""

    def __init__(self, value=None, has_timed_out=False):
        self._value = value
        self.hasTimedOut = has_timed_out
        self.removed = False
        self.timeout_set_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set_ms = ms


def test_sessionize_timeout_evicts_and_emits_final_totals():
    from data_mastery_pipeline_spark.streaming.stateful import _make_sessionize

    fold = _make_sessionize(60_000)
    st = _FakeGroupState(value=(1_000_000, 3, 42), has_timed_out=True)
    out = list(fold((7,), iter([]), st))
    assert st.removed, "timed-out key must be evicted"
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["user_id"], row["n_sessions"], row["n_events"]) == (7, 3, 42)


def test_sessionize_sets_timer_only_when_ttl_given():
    import pandas as pd

    from data_mastery_pipeline_spark.streaming.stateful import GAP_US, _make_sessionize

    pdf = pd.DataFrame({"ts": pd.to_datetime([0, GAP_US * 2_000], unit="ns")})

    st = _FakeGroupState()
    list(_make_sessionize(60_000)((1,), iter([pdf]), st))
    assert st.timeout_set_ms == 60_000

    st2 = _FakeGroupState()
    list(_make_sessionize(None)((1,), iter([pdf]), st2))
    assert st2.timeout_set_ms is None  # NoTimeout path must not touch timers
    # both paths agree on the fold itself: 2 events, ts gap > GAP_US ⇒ 2 sessions
    assert st2.get == st.get and st2.get[1:] == (2, 2)


def test_interval_join_fanout_guard_trips_on_degenerate_timestamps(spark, tmp_path):
    """Round-3 regression class: collapsed event time (a 1000x density
    spike from misdecoded timestamps) must raise BEFORE the join runs,
    not silently inflate the output 1000x."""
    import datetime

    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.streaming import joins as sjoins

    base = datetime.datetime(2024, 1, 1)
    # 2000 purchases crammed into 10 seconds: density 200/s, expected
    # matches per row at +/-120s ~ 48000 >> 64
    degenerate = spark.range(2000).select(
        (F.lit(base) + F.make_interval(secs=F.col("id") / 200.0)).alias("ts")
    )
    with pytest.raises(sjoins.IntervalJoinFanoutError, match="degenerate"):
        sjoins.check_interval_fanout(degenerate, "ts", tolerance_seconds=120)

    # healthy spread (2000 rows over ~23 days) passes and returns the estimate
    healthy = spark.range(2000).select(
        (F.lit(base) + F.make_interval(secs=F.col("id") * F.lit(1000.0))).alias("ts")
    )
    est = sjoins.check_interval_fanout(healthy, "ts", tolerance_seconds=120)
    assert 0 < est < 64


def test_interval_join_fanout_guard_empty_input_ok(spark):
    from pyspark.sql import types as T

    from data_mastery_pipeline_spark.streaming import joins as sjoins

    empty = spark.createDataFrame([], T.StructType([T.StructField("ts", T.TimestampType())]))
    assert sjoins.check_interval_fanout(empty, "ts", tolerance_seconds=120) == 0.0


def test_foreachbatch_cdc_upsert_converges_to_latest(spark, staged_events, tmp_path):
    """Streaming CDC sink: each micro-batch MERGEs its latest-per-key
    state into a partitioned parquet target via foreachBatch +
    merge_upsert_partitioned. After draining the 4-batch replay, the
    target holds exactly one row per (user, day) carrying the latest
    event — the streaming version of the SCD-1 upsert the batch tests
    prove, and the plain-parquet analog of a table-format MERGE sink."""
    path, ev = staged_events
    target = str(tmp_path / "cdc_target")
    ckpt = str(tmp_path / "cdc_ckpt")

    from data_mastery_pipeline_spark.sources import writers

    def upsert_batch(batch_df, batch_id):
        latest = (
            batch_df.withColumn("day", F.to_date("ts"))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id", "day").orderBy(
                        F.desc("ts"), F.desc("event_id")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select("user_id", "day", "event_id", "ts", "value")
        )
        writers.merge_upsert_partitioned(
            spark, target, latest, key_cols=["user_id", "day"], partition_cols=["day"]
        )

    q = (
        _stream_staged(spark, path)
        .writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(target)
    # exactly one row per (user, day)
    dup = got.groupBy("user_id", "day").count().filter(F.col("count") > 1).count()
    assert dup == 0
    # and it is the LATEST event per (user, day) of the whole replay
    expect = (
        ev.withColumn("day", F.to_date("ts"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "day").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "event_id")
    )
    got_keys = {(r["user_id"], str(r["day"]), r["event_id"]) for r in got.collect()}
    want_keys = {(r["user_id"], str(r["day"]), r["event_id"]) for r in expect.collect()}
    assert got_keys == want_keys


def test_foreachbatch_quarantine_routing_matches_batch_audit(spark, tmp_path):
    """Streaming dead-letter routing: each micro-batch is split by the
    shared validation_reason() classifier — clean rows append to the
    pass-through sink, failing rows to a reason-partitioned quarantine
    sink. After the 2-batch replay every event landed exactly once and
    the per-reason counts equal the batch audit (events_quarantine's
    classifier over the full table)."""
    from data_mastery_pipeline_spark.queries_ops import validation_reason

    ev = load_table(spark, "events", SF_SMOKE).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    base = tmp_path / "qsrc"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(base / "b0"))
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(base / "b1"))
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{base}/b*")
    )
    clean, quar = str(tmp_path / "clean"), str(tmp_path / "quarantine")

    def route(batch_df, _bid):
        tagged = batch_df.withColumn("reason", validation_reason())
        tagged.filter("reason = 'ok'").drop("reason").write.mode("append").parquet(
            clean
        )
        tagged.filter("reason <> 'ok'").write.mode("append").partitionBy(
            "reason"
        ).parquet(quar)

    q = (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    clean_df = spark.read.parquet(clean)
    quar_df = spark.read.parquet(quar)
    n_total = ev.count()
    assert clean_df.count() + quar_df.count() == n_total
    got = {r["reason"]: r["count"] for r in quar_df.groupBy("reason").count().collect()}
    want = {
        r["reason"]: r["n"]
        for r in ev.select(validation_reason().alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
        if r["reason"] != "ok"
    }
    assert got == want and got  # the k>90 rule genuinely fires
    ids = [
        r["event_id"]
        for r in clean_df.select("event_id")
        .union(quar_df.select("event_id"))
        .collect()
    ]
    assert len(ids) == len(set(ids)) == n_total


def test_checkpoint_restart_resumes_without_reprocessing(spark, tmp_path):
    """Durability contract (S8/J2): an availableNow drain commits its
    offsets; a later restart with the SAME checkpoint processes only
    the files that arrived in between — nothing is reprocessed, nothing
    is dropped."""
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    ev = load_table(spark, "events", SF_SMOKE).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    quarters = [ev.filter(F.col("event_id") % 4 == i) for i in range(4)]
    for i in (0, 1):
        quarters[i].coalesce(1).write.parquet(f"{src}/b{i}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def drain():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/b*")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first == quarters[0].count() + quarters[1].count()

    for i in (2, 3):
        quarters[i].coalesce(1).write.parquet(f"{src}/b{i}")
    drain()

    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # nothing dropped
    assert got.select("event_id").distinct().count() == ev.count()  # nothing twice


def test_streaming_listener_reports_input_rows(spark, staged_events):
    """Observability: a StreamingQueryListener sees every micro-batch's
    numInputRows; their sum equals the replayed row count (the metrics
    feed an ops dashboard would ingest)."""
    import time as _t

    from pyspark.sql.streaming import StreamingQueryListener

    path, ev = staged_events
    captured = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            captured.append(event.progress.numInputRows)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _Capture()
    spark.streams.addListener(listener)
    try:
        q = (
            _stream_staged(spark, path)
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async — poll until the replay is fully seen
        deadline = _t.time() + 20
        while sum(captured) < ev.count() and _t.time() < deadline:
            _t.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    assert sum(captured) == ev.count()
    assert len([n for n in captured if n > 0]) >= 4  # one per staged file


def test_idempotent_sink_dedups_within_batch_and_null_keys(spark, tmp_path):
    """Review r6, 11th pass: (a) both copies of a key arriving in ONE
    micro-batch must not both land (the anti-join alone sees neither in
    the target); (b) a NULL-keyed row must not re-append on every
    replay (plain '=' anti-join never matches NULL)."""
    from data_mastery_pipeline_spark.streaming import sinks

    target = str(tmp_path / "tgt")
    batch = spark.createDataFrame(
        [(1, "a"), (1, "a-dup"), (None, "nullkey")], "k long, v string"
    )
    sinks.idempotent_append_batch(batch, target, keys=["k"])
    first = spark.read.parquet(target)
    assert first.count() == 2  # one copy of k=1, one null-key row
    # replay the same batch: nothing new lands, including the null key
    sinks.idempotent_append_batch(batch, target, keys=["k"])
    assert spark.read.parquet(target).count() == 2


def test_idempotent_sink_missing_key_column_fails_loudly(spark, tmp_path):
    """A misnamed key column must raise, not silently disable dedup
    forever (review r6, 11th pass: the select lived inside the
    existence-probe try)."""
    import pytest as _pytest

    from data_mastery_pipeline_spark.streaming import sinks

    target = str(tmp_path / "tgt2")
    batch = spark.createDataFrame([(1, "a")], "k long, v string")
    sinks.idempotent_append_batch(batch, target, keys=["k"])
    with _pytest.raises(Exception, match="wrong_key|UNRESOLVED"):
        sinks.idempotent_append_batch(batch, target, keys=["wrong_key"])


def test_sessionize_fold_handles_late_and_null_timestamps():
    """Review r6, 11th pass: a null ts must not become the int64
    sentinel (phantom session), and a late event older than state must
    count in n_events without regressing the session frontier."""
    import pandas as pd

    from data_mastery_pipeline_spark.streaming import stateful

    fold = stateful._make_sessionize(None)

    class _FakeState:
        hasTimedOut = False

        def __init__(self, value=None):
            self._v = value

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def setTimeoutDuration(self, ms):  # pragma: no cover
            pass

    us = 1_000_000
    hour = 3600 * us

    def run_batch(state, ts_list):
        pdf = pd.DataFrame({"ts": pd.to_datetime([t * 1000 for t in ts_list])})
        return list(fold((7,), iter([pdf]), state))[-1]

    # batch 1: one event at t = 12h
    st = _FakeState()
    run_batch(st, [12 * hour])
    assert st.get == (12 * hour, 1, 1)
    # batch 2: a LATE event at t = 9h — counted, frontier not regressed,
    # no session merge/split
    run_batch(st, [9 * hour])
    assert st.get == (12 * hour, 1, 2)
    # batch 3: null ts contributes nothing
    st2 = _FakeState((12 * hour, 1, 1))
    pdf = pd.DataFrame({"ts": pd.to_datetime([None])})
    list(fold((7,), iter([pdf]), st2))
    assert st2.get == (12 * hour, 1, 1)


def test_interval_join_rejects_zero_tolerance(spark):
    import pytest as _pytest

    from data_mastery_pipeline_spark.streaming import joins as sjoins

    ev = spark.readStream.format("rate").load()
    with _pytest.raises(ValueError, match="tolerance_seconds"):
        sjoins.interval_join_streams(
            ev, ev.withColumnRenamed("value", "v2"), "timestamp", "timestamp",
            tolerance_seconds=0,
        )


def test_fanout_guard_single_row_batch_is_healthy(spark):
    """Review r6, 11th pass: n=1 with a wide tolerance must not trip
    the degeneracy error (one right row matches at most once)."""
    from data_mastery_pipeline_spark.streaming import joins as sjoins

    one = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "id long, ts string"
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    est = sjoins.check_interval_fanout(
        one, "ts", tolerance_seconds=60, max_expected_matches_per_row=64
    )
    assert est <= 1.0


def test_drift_monitor_multibatch_exactly_once(spark, tmp_path):
    """streaming/drift.py across REAL micro-batch boundaries: two
    drains with new DML between them (each its own trigger), one PSI
    log row per trigger, maintained bins == direct binning after every
    drain, and a same-checkpoint replay that delivers nothing new
    no-ops both the merge and the log (exactly-once end to end)."""
    import os

    from data_mastery_pipeline_spark.sources import txlog as _txlog
    from data_mastery_pipeline_spark.streaming import drift

    ev = load_table(spark, "events", SF_SMOKE)
    src_root = str(tmp_path / "src")
    src = _txlog.TxTable.create(
        spark,
        src_root,
        ev.filter(F.col("event_id") % 4 == 0).repartition(2, "event_id"),
        stat_cols=["event_id", "value"],
    )
    mon = drift.DriftMonitor(
        spark,
        src,
        str(tmp_path / "mon"),
        "value",
        edges=[float(x) for x in range(0, 501, 50)],
        ref_version=0,
    )
    _txlog.register(spark)

    def drain():
        q = (
            spark.readStream.format("txlog_feed")
            .option("root", src_root)
            .option("mode", "cdf")
            .load()
            .writeStream.foreachBatch(mon.sink())
            .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # trigger 1: the reference state itself → PSI ≈ 0
    mon.assert_consistent()
    log1 = mon.psi_log.read().collect()
    assert len(log1) == 1
    assert abs(log1[0]["psi"]) < 1e-6  # cur == ref

    # trigger 2: shift mass up hard, delete the low bins
    src.update_where(
        "value", 0.0, 200.0, {"value": F.col("value") + 250.0}, mode="dv"
    )
    src.delete_where("value", 200.0, 250.0)
    drain()
    mon.assert_consistent()
    log2 = sorted(
        mon.psi_log.read().collect(), key=lambda r: r["batch_id"]
    )
    assert len(log2) == 2
    assert log2[1]["batch_id"] > log2[0]["batch_id"]
    assert log2[1]["psi"] > log2[0]["psi"]  # drift grew
    assert log2[1]["psi"] > 0.2  # the shift is detected
    one = mon.current_psi().select("drift_detected").distinct().collect()
    assert [r["drift_detected"] for r in one] == [True]

    # replay: nothing new on the feed → no third log row, bins stable
    bins_before = sorted(
        tuple(r) for r in mon.bins.read().collect()
    )
    drain()
    assert mon.psi_log.read().count() == 2
    assert sorted(tuple(r) for r in mon.bins.read().collect()) == bins_before


def test_ks_drift_monitor_multibatch_exactly_once(spark, tmp_path):
    """KsDriftMonitor (r10) across REAL micro-batch boundaries — the
    PSI twin's contract for the shape statistic: one ks_log row per
    trigger, maintained value counts == direct counting after every
    drain, D grows when mass shifts, and a same-checkpoint replay
    no-ops both the merge and the log."""
    import os

    from data_mastery_pipeline_spark.sources import txlog as _txlog
    from data_mastery_pipeline_spark.streaming import drift

    ev = load_table(spark, "events", SF_SMOKE)
    src_root = str(tmp_path / "src")
    src = _txlog.TxTable.create(
        spark,
        src_root,
        ev.filter(F.col("event_id") % 4 == 0).repartition(2, "event_id"),
        stat_cols=["event_id", "value"],
    )
    mon = drift.KsDriftMonitor(
        spark, src, str(tmp_path / "mon"), "value", ref_version=0
    )
    _txlog.register(spark)

    def drain():
        q = (
            spark.readStream.format("txlog_feed")
            .option("root", src_root)
            .option("mode", "cdf")
            .load()
            .writeStream.foreachBatch(mon.sink())
            .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # trigger 1: the reference state itself → D == 0 exactly
    mon.assert_consistent()
    log1 = mon.ks_log.read().collect()
    assert len(log1) == 1
    assert log1[0]["d_stat"] == 0.0  # identical samples: every gap is 0

    # trigger 2: shift mass up hard, delete a band
    src.update_where(
        "value", 0.0, 200.0, {"value": F.col("value") + 250.0}, mode="dv"
    )
    src.delete_where("value", 200.0, 250.0)
    drain()
    mon.assert_consistent()
    log2 = sorted(mon.ks_log.read().collect(), key=lambda r: r["batch_id"])
    assert len(log2) == 2
    assert log2[1]["d_stat"] > log2[0]["d_stat"]
    row = mon.current_ks().first()
    assert row["drift_detected"]  # a 250-point shift is unmissable
    assert 0.0 < row["d_stat"] <= 1.0

    # replay: nothing new on the feed → no third log row, state stable
    vals_before = sorted(tuple(r) for r in mon.vals.read().collect())
    drain()
    assert mon.ks_log.read().count() == 2
    assert sorted(tuple(r) for r in mon.vals.read().collect()) == vals_before


def test_cusum_drift_monitor_multibatch_exactly_once(spark, tmp_path):
    """CusumDriftMonitor (r10): one cusum_log row per trigger,
    maintained integer-cents day state == direct summing after every
    drain, a sustained shift raises the statistic, and a
    same-checkpoint replay no-ops merge and log."""
    import os

    from data_mastery_pipeline_spark.sources import txlog as _txlog
    from data_mastery_pipeline_spark.streaming import drift

    orders = load_table(spark, "orders", SF_SMOKE).select(
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    src_root = str(tmp_path / "src")
    src = _txlog.TxTable.create(
        spark,
        src_root,
        orders.filter(F.col("o_orderkey") % 2 == 0).repartition(2),
        stat_cols=["day", "cents"],
    )
    mon = drift.CusumDriftMonitor(
        spark, src, str(tmp_path / "mon"), "day", "cents", ref_version=0
    )
    _txlog.register(spark)

    def drain():
        q = (
            spark.readStream.format("txlog_feed")
            .option("root", src_root)
            .option("mode", "cdf")
            .load()
            .writeStream.foreachBatch(mon.sink())
            .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # trigger 1: reference state → no sustained deviation
    mon.assert_consistent()
    log1 = mon.cusum_log.read().collect()
    assert len(log1) == 1

    # trigger 2: a sustained +50k shift on the late half of the series
    src.update_where(
        "day", "1996-01-01", "9999-12-31",
        {"cents": F.col("cents") + 5_000_000}, mode="dv",
    )
    drain()
    mon.assert_consistent()
    log2 = sorted(mon.cusum_log.read().collect(), key=lambda r: r["batch_id"])
    assert len(log2) == 2
    assert log2[1]["max_up"] > log2[0]["max_up"]  # the shift registered
    assert log2[1]["alarm"]  # far beyond 4 sigma

    # replay: no new feed data → no third log row, day state stable
    days_before = sorted(tuple(r) for r in mon.days.read().collect())
    drain()
    assert mon.cusum_log.read().count() == 2
    assert sorted(tuple(r) for r in mon.days.read().collect()) == days_before


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_sessionize_tws_raises_clearly_without_protobuf(spark):
    """transformWithState is ENV-BLOCKED here (no protobuf in the
    container): the operator must fail at CONSTRUCTION with a clear
    message, not let the stream die with 'driver worker exited
    unexpectedly' at start."""
    if _has_protobuf():
        pytest.skip("protobuf present — the blocked-path contract is moot")
    from data_mastery_pipeline_spark.streaming import stateful

    ev = load_table(spark, "events", SF_SMOKE).select("ts", "user_id")
    with pytest.raises(RuntimeError, match="protobuf"):
        stateful.sessionize_users_tws(ev)


@pytest.mark.skipif(
    not _has_protobuf(), reason="transformWithState needs protobuf (env-blocked here)"
)
def test_sessionize_tws_matches_apply_in_pandas_with_state(spark, tmp_path):
    """Where the environment allows it, both stateful-API generations
    must produce the identical final per-user session totals."""
    import os

    from data_mastery_pipeline_spark.streaming import core, stateful

    ev = load_table(spark, "events", SF_SMOKE).select("ts", "user_id")
    d = os.path.join(str(tmp_path), "ev")
    ev.write.parquet(d)
    sdf = (
        spark.readStream.schema("ts timestamp, user_id long").parquet(d)
    )
    old = core.run_available_now(
        stateful.sessionize_users(sdf, state_ttl_ms=None),
        output_mode="update",
        shuffle_partitions=4,
    )
    with core.rocksdb_state(spark):
        new = core.run_available_now(
            stateful.sessionize_users_tws(sdf),
            output_mode="update",
            shuffle_partitions=4,
        )
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
