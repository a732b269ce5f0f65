"""End-to-end weather pipeline (SURVEY §3.1): one Spark app replaces the
reference's seven-task DAG; stages audited, quality-gated, written."""

from __future__ import annotations

import os
import tempfile

from data_mastery_pipeline_spark import pipeline

from conftest import SF_SMOKE


def test_full_pipeline_runs_and_writes(spark):
    out = tempfile.mkdtemp()
    res = pipeline.run_weather_pipeline(spark, out, n_cycles=24)

    # 5 cities × 24 cycles, nothing filtered by the synthetic value ranges
    assert res.silver_rows == 120
    # 22:13 UTC start → each city spans exactly 2 calendar days
    assert res.daily_rows == 10
    assert res.hourly_rows == 120
    assert res.quality.passed

    for name in ("weather_cleaned", "daily_weather_summary", "hourly_weather_summary"):
        assert os.path.isdir(os.path.join(out, name)), name
    # silver is hive-partitioned by event date
    assert any(
        d.startswith("year=") for d in os.listdir(os.path.join(out, "weather_cleaned"))
    )

    audit = res.audit.collect()
    assert {r["stage"] for r in audit} == {"silver_detail", "gold_daily", "gold_hourly"}
    assert all(r["status"] == "success" for r in audit)


def test_silver_derivations_present(spark):
    bronze = pipeline.ingest_bronze(spark, n_cycles=2)
    silver = pipeline.to_silver(bronze)
    cols = set(silver.columns)
    assert {"year", "month", "day", "hour", "day_of_week", "week_of_year",
            "quarter", "temp_range", "heat_index", "is_weekend", "is_day",
            "quality_score"} <= cols
    # synthetic data is null-free → every score is the full 100
    assert silver.filter("quality_score != 100").count() == 0


def test_stream_silver_effectively_once(spark):
    import time

    out = os.path.join(tempfile.mkdtemp(), "silver_stream")
    ckpt = tempfile.mkdtemp()
    q = pipeline.stream_silver(spark, out, ckpt, cities=("Paris", "London"))
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            if n >= 6:  # ≥3 poll cycles × 2 cities
                break
            time.sleep(0.3)
    finally:
        q.stop()

    got = spark.read.parquet(out)
    n = got.count()
    assert n >= 6
    # effectively-once: key (city, timestamp) is unique despite
    # at-least-once delivery + any replayed batches
    assert got.select("city", "timestamp").distinct().count() == n
    # derivations flowed through the streaming path too
    assert {"heat_index", "quality_score", "is_day"} <= set(got.columns)

    # replaying an already-written batch is a no-op (S8 contract)
    from data_mastery_pipeline_spark.streaming import sinks

    first = pipeline.to_silver(
        pipeline.ingest_bronze(spark, ("Paris", "London"), n_cycles=1)
    )
    sinks.idempotent_append_batch(first, out, keys=["city", "timestamp"])
    assert spark.read.parquet(out).count() == n


def test_bench_emits_one_valid_json_line(spark, monkeypatch, capsys):
    """The driver parses bench.py's stdout as ONE JSON line with fixed
    keys — a formatting regression would lose the round's BENCH row.
    Run main() against two cheap queries at smoke scale and parse."""
    import json

    import bench

    monkeypatch.setattr(bench, "SF_DIR", SF_SMOKE)
    monkeypatch.setattr(bench, "HEADLINE", ["top10_orders", "hourly_agg"])
    bench.main()
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    payload = json.loads(out[-1])
    assert payload["metric"] == "headline_query_wall_seconds_total"
    assert payload["unit"] == "sec"
    assert set(payload["queries"]) == {"top10_orders", "hourly_agg"}
    assert payload["value"] > 0 and payload["sf"] == 0.001
