#!/usr/bin/env python
"""Benchmark harness — the driver runs this per-round and records BENCH_r{N}.json.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect bottleneck). Session build time is excluded from
per-query numbers but reported separately; `value` is the sum of query
wall times (lower is better).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries: one per operator family (agg, star join, window,
# as-of, dedup, top-k, json, extension ops as they land).
HEADLINE = [
    "pricing_summary",
    "star_revenue",
    "hourly_agg",
    "weekly_rollup",
    "running_total",
    "dedup_latest",
    "asof_join_purchases",
    "range_join_late_ships",
    "top10_orders",
    "json_props",
    "minhash_near_dup",
    "ann_cosine_topk",
    "text_quality",
    "partitioned_roundtrip",
    "stream_tumbling_hourly",
    "user_sessions_batch",
    "big_orders",
    "clicks_near_purchases",
    "embedding_centroids",
    "near_dup_clusters",
    # round 2 additions
    "pg_serving_roundtrip",
    "text_repetition",
    "contamination_check",
    # round 4 additions
    "lm_bigram_quality",
    "source_unigram_drift",
    # round 5 additions: iterative ML, CDC, set analytics
    "kmeans_embeddings",
    "snapshot_diff",
    "audience_overlap",
    # round 5 batch 2: decision-support completion + corpus hygiene
    "local_supplier_volume",
    "boilerplate_ngram_share",
    "pagerank_event_types",
    # round 5 batch 3 (VERDICT r04 task 6): heaviest never-benched —
    # pair generation + per-pair Levenshtein are the likeliest hidden
    # costs on the new dedup surface
    "shared_substring_spans",
    "bm25_search",
    "incremental_minhash_dedup",
    # r10: replaced prefix_edit_near_dups (brute blocked join, 34× at
    # the 10× capture — adjudicated quadratic r9) with the MinHash-LSH
    # prefilter + banded-Levenshtein path (same exact-brute oracle)
    "edit_near_dups_lsh",
    "head_edit_join_tight",  # ED-Join prefix filter (tight k)
    # round 5 batch 4: format breadth + scan-reduction (late batch)
    "orc_roundtrip",
    "csv_quarantine_roundtrip",
    # round 10: JSON-lines (.jsonl.gz) corpus round trip + quarantine
    "jsonl_quarantine_roundtrip",
    "bloom_join_prune",
    "file_pruning_stats",
    # round 5 batch 5: tokenizer induction, ANN join, containment dedup
    "bpe_merge_candidates",
    "knn_graph",
    # round 11: knn_graph re-scoped to the sign-LSH cell-blocked graph
    # (linear mass); its bounded recall certificate benches with it
    "knn_graph_recall",
    # round 11: catalog-stats star join (orders promoted to broadcast
    # from the selectivity estimate static planning misses)
    "cbo_star_urgent",
    # round 12: near_dup_clusters re-scoped to simhash-cell blocked
    # edges (linear mass); its measured recall certificate benches too
    "near_dup_blocking_recall",
    "containment_pairs",
    # round 5 batch 6: graph analytics, SCD2 temporal, join IVM
    "triangle_count",
    "scd2_user_values",
    "incremental_join_maintenance",
    # round 5 batch 7: the live wire path (S3+S4 over real TCP)
    "kafka_wire_roundtrip",
    # round 6: the wire STREAMING path (micro-batch offsets over TCP)
    "kafka_wire_stream_hourly",
    # round 6: from-scratch Avro container round trip
    "avro_roundtrip",
    # round 6: the full architecture over real transports
    # (TCP kafka-wire -> gold agg -> live PG upsert -> sliced read)
    "wire_to_serving_daily",
    # round 6: transaction-log table format (ACID commits, stats pruning)
    "txlog_acid_roundtrip",
    # round 6: expression-breadth suites (codegen lambdas / try_cast)
    "array_hof_suite",
    "safe_cast_suite",
    # round 6: deterministic epoch shuffle (two-phase global positions)
    "epoch_shuffle",
    # round 6: txlog incremental reads (CDF replay; version-offset stream)
    "txlog_change_feed",
    "txlog_stream_feed",
    # round 6: merge-on-read deletes/updates (deletion vectors)
    "txlog_deletion_vectors",
    "txlog_merge_on_read_update",
    # round 6: streaming CDC over the transaction log
    "txlog_stream_cdf",
    # round 6: CHECK constraints + timestamp time travel
    "txlog_constraints_asof",
    # round 6: the reference DAG's operational semantics (orchestrator)
    "weather_dag_run",
    # round 7: governance (tokenized rollup is the costliest: 64-byte
    # join keys; the audits/DP are one aggregate each, folded into the
    # rollup's number class), spatial grid join + kNN, PIT features
    "pseudonymize_users",
    "dp_noisy_counts",
    "spatial_distance_join",
    "spatial_knn",
    "feature_store_pit",
    # round 7: MV lifecycle (txlog source load + 2 incremental CDF
    # refreshes + dv retraction + navigation answer)
    "mv_navigation",
    # round 7: result-cache lifecycle (miss + hit + refusal +
    # fingerprint invalidation), OHLC bars, time-weighted average
    "result_cache_daily",
    "ohlc_hourly",
    "time_weighted_avg",
    # round 7: metadata-only RESTORE TO VERSION lifecycle
    "txlog_restore",
    # round 7: streaming geofence (spatial x streaming composition)
    # and the Benford first-digit quality audit
    "stream_geofence_counts",
    "benford_price_audit",
    # round 7: experimentation/statistics (rank-sum drift, CUPED,
    # Kaplan-Meier survival)
    "mann_whitney_value_drift",
    "cuped_ab_test",
    "kaplan_meier_retention",
    # round 8: MIN/MAX MV lifecycle (monotone fold + equality-breach
    # group rescan + navigation), column-mapping lifecycle (rename /
    # pruned DV delete / drop+readd / CDF replay), the SQL DML
    # front-end lifecycle, and IVF-PQ (5 k-means fits + ADC + re-rank
    # — the index BUILD dominates; search is the cheap part)
    "mv_minmax",
    # round 8: join-view IVM under the MV API (two txlog sources,
    # bilinear two-phase refresh)
    "mv_join_view",
    "txlog_column_mapping",
    "txlog_sql_dml",
    "ann_ivfpq_topk",
    "ann_ivfpq_serve",  # prebuilt-index probe: min-of-3 = serve-only
    # round 8: calendar gap-fill with LOCF (spine explode + partitioned
    # window)
    "gap_fill_daily",
    # round 8: navigator routing lifecycle (two MVs, stale reroute)
    "mv_navigator_route",
    # round 8: exact PERCENTILE_DISC via distinct-value prefix sums
    # (no global sort)
    "exact_value_percentiles",
    # round 8: Misra-Gries two-pass exact top-k (stream never shuffled)
    "heavy_hitter_tokens",
    # round 8: bloom file-skipping point lookup on the table format
    "txlog_bloom_lookup",
    # round 8: shallow clone zero-copy branch lifecycle
    "txlog_clone_branch",
    # round 8: atomic predicate overwrite (Delta replaceWhere shape)
    "txlog_replace_where",
    # round 8: SCD2 dimension maintained from the change feed
    "scd2_dimension_history",
    # round 8: incremental IVF index maintenance (O(new vectors) append)
    "ann_index_incremental",
    # round 8: one-pass key/FD audit and anti-entropy bucket checksums
    "key_fd_discovery",
    "table_checksum_buckets",
    # round 8: write-audit-publish staging over shallow clone + CDF
    "wap_publish_flow",
    # round 8 session 4: distribution monitoring, scorecard analytics,
    # Count-Min sketch, declarative expectation suite
    "ks_test_drift",
    "cusum_revenue_shift",
    "woe_iv_value_deciles",
    "countmin_token_counts",
    "expectation_suite",
    "seasonal_decompose_daily",
    "event_transition_matrix",
    "association_rules",
    "txlog_auto_maintain",
    # round 10: ANALYZE→CBO loop inside a query path (auto-ANALYZE on
    # maintenance + catalog-stats broadcast of a derived dim)
    "cbo_broadcast_enrichment",
    # round 10: α-temperature mixture resampling (deterministic
    # data-mixing gate; two strata aggregates + one narrow filter)
    "alpha_mixture_resample",
    "hybrid_search_rrf",
    "seasonal_residual_anomalies",
    "catalog_consistent_reads",
]
# Deliberately NOT benched (documented, not silent — each is a
# composition whose costly legs are already timed by other entries):
#   leakage_safe_splits      re-runs the near-dup pipeline that
#                            near_dup_clusters times (r6 session 1)
#   zorder_pruning_stats     9.6 s: 16-file z-ordered rewrite of events
#                            + pruning probes; the write path is
#                            partitioned_roundtrip's, the curve math is
#                            a narrow projection
#   user_erasure_roundtrip   7.2 s: hive-partitioned write + dynamic
#                            partition overwrite — both legs inside
#                            partitioned_roundtrip / merge paths
#   txlog_ivm_cdc            ~25 s: two CDC stream drains + exactly-once
#                            merges — every leg timed elsewhere
#   bm25_index_search        ~64 s at sf0.1: a full index LIFECYCLE
#                            (txlog staging + backfill + 2 incremental
#                            refreshes + delete + scan-vs-index
#                            self-assert) — the serving-path legs are
#                            bm25_search (scoring) and txlog entries
#                            (storage); the lifecycle is correctness
#                            coverage, not a throughput unit
#                            (txlog_stream_cdf drains the same feed,
#                            txlog_acid_roundtrip times the merge path);
#                            the cost is fixed micro-batch machinery,
#                            not data volume
#   kafka_wire_lake_daily    12.8 s: wire produce + readStream +
#                            foreachBatch lake appends; the transport
#                            and streaming legs are kafka_wire_roundtrip
#                            + kafka_wire_stream_hourly's entries
#   stream_psi_drift         ~30 s: txlog lifecycle (create + 3 DML) +
#                            a checkpointed stream drain + per-trigger
#                            PSI commits — fixed micro-batch machinery
#                            (the txlog_stream_cdf argument); the PSI
#                            arithmetic itself is a 12-row relation
#   stream_ks_drift          ~40 s: same lifecycle class as
#                            stream_psi_drift (create + 3 DML + drain
#                            + per-trigger commits); the KS statistic
#                            is one prefix-sum pass over the
#                            distinct-value union, timed in ks_test_drift
#   stream_cusum_drift       ~25 s: same lifecycle class; the CUSUM
#                            recursion runs on the calendar-bounded
#                            day relation, timed in cusum_revenue_shift
#   mv_sql_lifecycle         ~15 s: CREATE MV (full aggregate) + 2 DML
#                            + refresh — each leg benched via mv_minmax
#                            / mv_join_view / txlog_sql_dml; the SQL
#                            front-end adds only a regex parse
#   k_anonymity_audit /      each one hash aggregate over customer —
#   l_diversity_audit /      the shuffle class dp_noisy_counts times;
#   masked_serving_view /    masked view is a pure projection,
#   spatial_grid_density     grid density one cell-keyed aggregate


def _warm_python_datasource(spark) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _WarmReader(DataSourceReader):
        def read(self, partition):
            yield (1,)

    class _WarmWriter(DataSourceWriter):
        def write(self, it):
            for _ in it:
                pass
            return WriterCommitMessage()

        def commit(self, messages):
            return None

        def abort(self, messages):
            return None

    class _WarmSource(DataSource):
        @classmethod
        def name(cls):
            return "bench_warm_py"

        def schema(self):
            return "x int"

        def reader(self, schema):
            return _WarmReader()

        def writer(self, schema, overwrite):
            return _WarmWriter()

    spark.dataSource.register(_WarmSource)
    df = spark.read.format("bench_warm_py").load()
    df.write.format("bench_warm_py").mode("append").save()


def main() -> None:
    from data_mastery_pipeline_spark.allqueries import register_all

    register_all()  # every queries*.py — no per-tool list to drift
    from data_mastery_pipeline_spark.registry import QUERIES
    from data_mastery_pipeline_spark.session import get_spark

    t0 = time.time()
    spark = get_spark(app_name="bench")
    session_sec = time.time() - t0

    # warm the JVM/IO path once so per-query numbers measure the plans,
    # not first-touch class loading
    QUERIES["pricing_summary"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    # ...and the Python worker daemon (forked once per session): the
    # first Python-executing operator otherwise pays ~2-3 s of daemon +
    # import startup that belongs to session bring-up, not the query
    spark.range(2).toDF("x").mapInPandas(lambda it: it, "x long").write.format(
        "noop"
    ).mode("overwrite").save()
    # ...and the Python DATA SOURCE plan/write worker pools — each
    # pyspark.sql.worker.* module is its own cold-forked pool (~4-5 s on
    # first datasource use, measured); a 1-row no-op datasource
    # read+write here moves that to session bring-up where it belongs
    _warm_python_datasource(spark)

    from data_mastery_pipeline_spark.dedup import components as _cc

    timings: dict[str, float] = {}
    detail: dict[str, object] = {}
    reruns: dict[str, list[float]] = {}

    def _run_once(name: str) -> float:
        # time construction AND execution: queries with internal actions
        # (streaming drains, write-path roundtrips) do real work before
        # returning the DataFrame
        t = time.time()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t, 3)

    # SPARK_GRAFT_BENCH_SKIP=a,b,c or a=reason,b=reason — drop named
    # entries from this run, LOUDLY (recorded in the output JSON with
    # the REASON, never silent — ADVICE r11: a bare skip record cannot
    # distinguish "could not complete at this amplification" from "not
    # run to save time", and only the former is adjudication evidence
    # for tests/test_scale_growth.py). For scale captures on amplified
    # data where a fixed-machinery entry (e.g. the single-socket kafka
    # wire transport) can't take k× volume.
    skip_reasons: dict[str, str] = {}
    for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(","):
        s = s.strip()
        if not s:
            continue
        name, _, reason = s.partition("=")
        skip_reasons[name] = reason or "unspecified"
    skip = set(skip_reasons)
    unknown_skip = skip - set(HEADLINE)
    if unknown_skip:
        raise SystemExit(
            f"bench: SPARK_GRAFT_BENCH_SKIP names non-headline entries: "
            f"{sorted(unknown_skip)}"
        )
    if skip:
        detail["skipped_entries"] = dict(sorted(skip_reasons.items()))

    # SPARK_GRAFT_BENCH_ONLY=a,b,c — restrict the run to named entries
    # (r10 verdict task 3: the deep-amplification spot capture times
    # only the heaviest/highest-growth entries at 30–50×; running the
    # full surface there would burn an hour for no extra signal). The
    # restriction is recorded in the JSON so a partial capture can
    # never masquerade as a full one.
    only = {
        s
        for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if s.strip()
    }
    if only:
        unknown_only = only - set(HEADLINE)
        if unknown_only:
            raise SystemExit(
                f"bench: SPARK_GRAFT_BENCH_ONLY names non-headline "
                f"entries: {sorted(unknown_only)}"
            )
        detail["only_entries"] = sorted(only)
        skip = skip | (set(HEADLINE) - only)

    for name in HEADLINE:
        if name in skip:
            continue
        if name not in QUERIES:
            # loud, not a silent skip (the gen_plans rule): a headline
            # entry missing from the registry means the benched surface
            # silently shrank — exactly how round 7's first bench run
            # dropped the 6 new entries (queries_gov wasn't imported)
            raise SystemExit(
                f"bench: headline query {name!r} is not registered — "
                "bench.HEADLINE and the query registry have drifted"
            )
        timings[name] = _run_once(name)
        if name == "near_dup_clusters" and _cc.LAST_RUN_STATS:
            # per-round attribution (rounds × edges × wall) so a bench
            # anomaly on the iterative operator is explainable
            detail["near_dup_clusters_rounds"] = list(_cc.LAST_RUN_STATS)

    # VERDICT r05 task 4: entries over 2 s are re-timed (min-of-3, all
    # runs reported) so a loadavg spike can't masquerade as a plan
    # regression — r05's near_dup_clusters 6.78 s recorded vs 4.9 s warm
    # was exactly this ambiguity
    for name, first in list(timings.items()):
        if first <= 2.0:
            continue
        runs = [first] + [_run_once(name) for _ in range(2)]
        reruns[name] = runs
        timings[name] = min(runs)
    if reruns:
        detail["reruns_min_of_3"] = reruns

    # VERDICT r09 task 7: serve-latency section. The lifecycle entries
    # above time build+serve together; these three have a SERVING path
    # whose warm per-request cost is the number a deployment watches
    # (bm25_search scores against term-clustered postings,
    # ann_ivfpq_serve probes the build-once-per-process index,
    # result_cache_daily answers from the cache after the first miss).
    # warm = min of 3 repeat runs AFTER the headline run already paid
    # the cold build; a serving regression moves `warm` without having
    # to diff min-of-3 tails.
    serving = {}
    for name in ("bm25_search", "ann_ivfpq_serve", "result_cache_daily"):
        if name in skip or name not in QUERIES:
            continue
        runs = [_run_once(name) for _ in range(3)]
        serving[name] = {
            "warm_request_sec": min(runs),
            "runs": runs,
            "cold_headline_sec": timings.get(name),
        }
    if serving:
        detail["serving"] = serving

    # VERDICT r10 task 6: keyed-state footprint + per-batch latency per
    # stateful family under the production RocksDB provider — measured
    # state sizes ride every capture next to the clocks (growth bounds
    # documented in streaming/stateprobe.py + SCALING.md)
    from data_mastery_pipeline_spark.streaming import stateprobe

    if not only:  # restricted spot captures time only their entries
        try:
            detail["streaming_state"] = stateprobe.probe_state_store(
                spark, SF_DIR
            )
        except Exception as exc:  # a probe failure must not kill the capture
            detail["streaming_state"] = {"error": f"{type(exc).__name__}: {exc}"}

    # end-to-end corpus lifecycle (quality gate → dedups → decontam →
    # chunk → pack → write): the throughput number a training-data user
    # actually cares about, timed as one chained job
    import shutil
    import tempfile

    from data_mastery_pipeline_spark.corpus_pipeline import run_corpus_pipeline

    if not only:
        tmp = tempfile.mkdtemp(prefix="bench_corpus_")
        try:
            t = time.time()
            res = run_corpus_pipeline(spark, SF_DIR, tmp)
            detail["corpus_pipeline"] = {
                "wall_sec": round(time.time() - t, 3),
                **res.stage_rows,
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    contract = {
        "metric": "headline_query_wall_seconds_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "session_startup_sec": round(session_sec, 3),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
        # host contention, sampled at emit (1/5/15-min averages;
        # the 5-min window covers the run) — heavy dedup entries
        # are superlinearly sensitive to it (measured 53 vs 68 s
        # totals for identical code), so a reader can adjudicate
        # variance instead of guessing
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        **({"detail": detail} if detail else {}),
    }
    print(json.dumps(contract))
    # Measurement-REPORTING fix (r11, documented in OPTIMIZATION_r11.md):
    # the driver records only the last 2000 chars of stdout and parses
    # the JSON line found inside that window (BENCH_r01–r05: parsed OK,
    # line < 2000 chars). The full contract line above outgrew the
    # window in round 6 when the headline surface passed ~55 entries, so
    # BENCH_r06–r10 all carry parsed:null — five rounds of bench numbers
    # the driver never saw. The full line stays (complete per-query map;
    # nothing removed or renamed), and this SECOND, final line repeats
    # the same metric/value/unit/sf with the slowest entries that fit
    # the window, so the driver's tail parse works again. queries_total/
    # queries_shown mark the truncation loudly.
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])
    compact: dict[str, object] = {
        "metric": contract["metric"],
        "value": contract["value"],
        "unit": "sec",
        "sf": contract["sf"],
        "queries": {},
        "queries_total": len(timings),
        "queries_shown": 0,
        "session_startup_sec": contract["session_startup_sec"],
        "cpus": contract["cpus"],
        "loadavg": contract["loadavg"],
    }
    budget = 1900  # < 2000-char tail window, with margin for the newline
    for name, sec in slowest:
        compact["queries"][name] = sec
        compact["queries_shown"] = len(compact["queries"])
        if len(json.dumps(compact, separators=(",", ":"))) > budget:
            del compact["queries"][name]
            compact["queries_shown"] = len(compact["queries"])
            break
    print(json.dumps(compact, separators=(",", ":")))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
