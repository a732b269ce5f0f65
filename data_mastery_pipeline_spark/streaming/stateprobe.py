"""RocksDB keyed-state probe (r10 verdict task 6): measure, per
stateful-operator family, the STATE-STORE footprint (rows + bytes) and
per-batch latency under the production provider
(``core.rocksdb_state`` — RocksDB spills keyed state to local disk, so
executor heap is bounded by the block cache, not the key count).

The bench harness embeds the result as ``detail["streaming_state"]``
so every round's capture carries measured state sizes next to the
query clocks (SCALING.md documents the growth bounds).

KEYED-STATE GROWTH BOUNDS, per family (what the probe certifies at
one scale; the bound says how it extrapolates):

- **Windowed aggregation** (tumbling/sliding): state rows =
  |open windows| × |group keys| — CALENDAR-bounded (watermark closes
  windows), never data-volume-bounded. Sliding multiplies by
  window/slide overlap.
- **Stream dedup** (``dropDuplicatesWithinWatermark``): state rows =
  |distinct keys seen within the watermark horizon| — bounded by key
  cardinality × retention, the property that keeps dedup feasible on
  an unbounded stream.
- **Session windows**: state rows = |open sessions| ≤ |active keys in
  the horizon|; the gap merge collapses bursts, the watermark evicts
  closed sessions.
- **Drift monitors (PSI/KS/CUSUM, streaming/drift.py)**: deliberately
  NOT Spark state-store state — their state is the txlog-backed
  signed-fold tables: O(bins)=12 for PSI, O(|distinct quantized
  values|) for KS, O(days) integer cents for CUSUM, merged
  exactly-once per micro-batch. The state-store probe therefore covers
  the three families above; the monitors' state is measured as table
  bytes by their own assert_consistent/bench entries.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from . import core, dedup as sdedup, windows as swin

# state-store metrics worth publishing (present on Spark 4 progress)
_STATE_FIELDS = (
    "numRowsTotal",
    "numRowsUpdated",
    "memoryUsedBytes",
    "commitTimeMs",
)
# RocksDB-specific custom metrics proving the provider took effect and
# sizing the on-disk footprint
_ROCKSDB_FIELDS = (
    "rocksdbSstFileSize",
    "rocksdbTotalMemoryUsage",
)


def _drain_with_progress(
    stream_df: DataFrame,
    output_mode: str,
    shuffle_partitions: int = 8,
) -> list[dict]:
    """run_available_now's drain, but returning the PROGRESS records
    (state metrics live there) instead of the rows. Same hygiene:
    throwaway checkpoint + memory table dropped here, shuffle conf
    restored (it sizes the state-store count, bound at start)."""
    spark = stream_df.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, str(shuffle_partitions))
    name = f"probe_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = [p for p in q.recentProgress if p is not None]
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
    return progresses


def _summarize(progresses: list[dict]) -> dict:
    out: dict = {
        "n_batches": 0,
        "batch_duration_ms": 0,
        "state_operators": [],
    }
    for p in progresses:
        ops = p.get("stateOperators") or []
        if not ops and not p.get("numInputRows"):
            continue  # trailing no-data tick
        out["n_batches"] += 1
        out["batch_duration_ms"] += int(p.get("batchDuration", 0))
        for i, op in enumerate(ops):
            while len(out["state_operators"]) <= i:
                out["state_operators"].append(
                    {"operator": op.get("operatorName", f"op{i}")}
                )
            slot = out["state_operators"][i]
            for f in _STATE_FIELDS:
                if f in op:
                    # times accumulate; updated-rows accumulate;
                    # point-in-time totals keep the PEAK — availableNow
                    # appends a watermark-eviction batch whose end-state
                    # is 0 rows, and the footprint a deployment sizes
                    # for is the peak, not the drained tail
                    if f.endswith("TimeMs") or f == "numRowsUpdated":
                        slot[f] = slot.get(f, 0) + int(op[f])
                    else:
                        slot[f] = max(slot.get(f, 0), int(op[f]))
            cm = op.get("customMetrics") or {}
            for f in _ROCKSDB_FIELDS:
                if f in cm:
                    slot[f] = max(slot.get(f, 0), int(cm[f]))
    return out


def probe_state_store(spark: SparkSession, sf_dir: str) -> dict:
    """One measurement per stateful family (module docstring) over the
    events table at ``sf_dir``, under the RocksDB provider. Returns a
    JSON-ready dict keyed by family."""
    result: dict = {"provider": "rocksdb"}
    with core.rocksdb_state(spark):
        ev = core.stream_events(spark, sf_dir)
        result["windowed_agg"] = _summarize(
            _drain_with_progress(
                swin.tumbling_value_stats(ev, window="1 hour", watermark="1 hour"),
                output_mode="complete",
            )
        )
        ev = core.stream_events(spark, sf_dir)
        result["stream_dedup"] = _summarize(
            _drain_with_progress(
                sdedup.dedup_within_watermark(
                    ev, ["user_id", "event_type"], delay="1 hour"
                ),
                output_mode="append",
            )
        )
        ev = core.stream_events(spark, sf_dir)
        result["session_windows"] = _summarize(
            _drain_with_progress(
                swin.session_value_stats(
                    ev, gap="30 minutes", watermark="1 hour"
                ),
                output_mode="complete",
            )
        )
    return result
