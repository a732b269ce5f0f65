"""streaming/stateprobe.py: the per-family keyed-state probe must run
under the RocksDB provider and report non-trivial state rows, bytes,
and batch latency for each stateful family — the numbers bench.py
embeds as detail["streaming_state"] every capture."""

from __future__ import annotations

from data_mastery_pipeline_spark.streaming import stateprobe

from conftest import SF_SMOKE


def test_probe_reports_all_families(spark):
    out = stateprobe.probe_state_store(spark, SF_SMOKE)
    assert out["provider"] == "rocksdb"
    for fam in ("windowed_agg", "stream_dedup", "session_windows"):
        rep = out[fam]
        assert rep["n_batches"] >= 1, fam
        assert rep["batch_duration_ms"] > 0, fam
        ops = rep["state_operators"]
        assert ops, fam
        total = sum(op.get("numRowsTotal", 0) for op in ops)
        assert total > 0, (fam, ops)
        # the RocksDB provider actually took effect (custom metric
        # present) and the store reports a memory footprint
        assert any("rocksdbSstFileSize" in op for op in ops), fam
        assert any(op.get("memoryUsedBytes", 0) > 0 for op in ops), fam


def test_dedup_state_bounded_by_key_cardinality(spark):
    """The dedup family's growth bound: state rows == distinct
    (user_id, event_type) keys in the (single-batch) horizon — the
    cardinality x retention bound, not the event count."""
    from data_mastery_pipeline_spark.tables import load_table

    out = stateprobe.probe_state_store(spark, SF_SMOKE)
    ev = load_table(spark, "events", SF_SMOKE)
    n_keys = ev.select("user_id", "event_type").distinct().count()
    n_events = ev.count()
    got = sum(
        op.get("numRowsTotal", 0)
        for op in out["stream_dedup"]["state_operators"]
    )
    assert got == n_keys
    assert got < n_events  # the bound is keys, not stream volume
