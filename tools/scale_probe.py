#!/usr/bin/env python
"""Scale probe: how does the near-dup pipeline's wall time grow with
corpus size?

Amplifies the sf0.01 documents corpus k× by unioning k replicas with
offset doc_ids and a replica marker token interleaved every 3 tokens.
The marker breaks ~83% of each replica's 3-shingles, so replicas are NOT
near-dups of their originals or of each other (verified: cross-replica
Jaccard ≈ 0.17 < the 0.35 threshold) — the corpus grows k× while the
near-dup cluster structure replicates k×, i.e. pair count and cluster
count scale LINEARLY. A pipeline whose wall time grows superlinearly
under this probe has a scaling bug (all-pairs behavior, unbounded
buckets); near-linear growth is the evidence that banding + blocked
verification + contracted CC hold their complexity promises.

Run from the repo root (quiet box — same caveats as bench.py):

    python tools/scale_probe.py [k ...]   # default: 1 4 16

Prints one JSON line per k: docs, verified near-dup pairs, clusters,
and wall seconds for (signatures+banding+verify) and (CC clustering).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def amplified(spark, k: int):
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.tables import load_table

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    n = 10_000_000  # id offset stride, far above any real doc_id
    parts = []
    for r in range(k):
        if r == 0:
            parts.append(docs)
            continue
        marker = f"zrep{r}z"
        toks = F.split(F.trim(F.col("text")), r"\s+")
        # interleave the marker every 3 tokens: flatten 3-token slices
        # each followed by the marker — breaks most 3-shingles
        n_tok = F.size(toks)
        idx = F.sequence(F.lit(0), F.floor((n_tok - 1) / 3).cast("int"))
        rebuilt = F.array_join(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.concat(
                        F.slice(toks, i * 3 + 1, 3), F.array(F.lit(marker))
                    ),
                )
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                rebuilt.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def spatial_probe(ks) -> None:
    """Grid-distance-join amplification. The base points are first
    COMPRESSED into one 30°-wide longitude band (synthetic lon / 12),
    then each generation translates that band 40° east — bands are 10°
    apart edge-to-edge, and 10° of longitude is ≥556 km even at the
    |lat| ≤ 60 extreme, ≫ the 300 km radius. Cross-generation pairs
    are therefore geometrically impossible and the TRUE pair count
    scales exactly ×k (each generation is a pure translate; haversine
    is invariant under longitude translation). A grid join that
    degenerates (one giant bucket, missing cell pruning) would show
    ~k² candidate work and superlinear wall time; ×k pairs +
    near-linear wall is the evidence the cell equi-join holds its
    complexity promise. Valid for k ≤ 9 (40°·k on the circle).

    (The first probe draft shifted the UNCOMPRESSED global point set —
    generations then overlapped each other's territory and pair counts
    grew ~k² for a correct geometric reason; the compression is what
    makes linear growth the truth the probe checks against.)"""
    import time

    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.operators import spatial
    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.tables import load_table

    spark = get_spark(app_name="scale_probe_spatial")
    spark.range(10).count()

    def replicate(df, key, k):
        out = df.select(
            F.col(key),
            spatial.synth_lat_col(F.col(key)).alias("lat"),
            (spatial.synth_lon_col(F.col(key)) / F.lit(12.0)).alias(
                "lon"
            ),
        )
        gens = out.crossJoin(
            spark.range(k).select(F.col("id").alias("__g"))
        )
        return gens.select(
            (F.col(key) + F.col("__g") * F.lit(10_000_000)).alias(key),
            F.col("lat"),
            (
                ((F.col("lon") + 180.0 + F.col("__g") * 40.0) % 360.0)
                - 180.0
            ).alias("lon"),
        )

    for k in ks:
        if k > 9:
            raise SystemExit("spatial probe valid for k <= 9 (40° shifts)")
        left = replicate(
            load_table(spark, "customer", SF_DIR), "c_custkey", k
        )
        right = replicate(
            load_table(spark, "supplier", SF_DIR), "s_suppkey", k
        )
        t0 = time.time()
        pairs = spatial.grid_distance_join(
            left, right, radius_km=300.0, cell_size_deg=5.0,
            max_abs_lat_deg=60.0,
        )
        n = pairs.count()
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "k": k,
                    "left_points": k * 1500,
                    "right_points": k * 100,
                    "pairs": n,
                    "wall_sec": round(wall, 2),
                }
            ),
            flush=True,
        )


def mv_probe(ks) -> None:
    """Materialized-view refresh cost probe: build a txlog source k×
    larger (k replicas of the sf0.01 events slice), materialize the
    (event_type, day) sum/count view, then append a FIXED-size batch
    (1000 rows) and time refresh(). The claim under test is the
    feature's whole point: incremental refresh reads the CDF of the
    new commits only, so its wall time tracks |changed rows| and stays
    ~FLAT as the table grows — while the full-recompute alternative
    (timed alongside as `recompute_wall_sec`) grows with k."""
    import time

    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark import mv as _mv
    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.sources.txlog import TxTable
    from data_mastery_pipeline_spark.tables import load_table
    import tempfile

    spark = get_spark(app_name="scale_probe_mv")
    spark.range(10).count()
    base = load_table(spark, "events", SF_DIR).select(
        "event_id", "ts", "event_type", "value"
    )

    for k in ks:
        big = base
        for g in range(1, k):
            big = big.unionByName(
                base.withColumn(
                    "event_id", F.col("event_id") + F.lit(g * 10_000_000)
                )
            )
        root = tempfile.mkdtemp(prefix=f"mvprobe_k{k}_")
        src = TxTable.create(spark, root + "/src", big)
        view = _mv.SumCountView.create(
            spark,
            src,
            root + "/mv",
            "probe",
            dims={"event_type": "event_type", "day": "to_date(ts)"},
            value_expr="value",
        )
        view.refresh()  # initial materialization (not the measurement)
        batch = spark.createDataFrame(
            [
                (90_000_000 + i, None, "click", float(i % 7))
                for i in range(1000)
            ],
            "event_id long, ts timestamp, event_type string, value double",
        ).withColumn("ts", F.lit("2024-02-01 00:00:00").cast("timestamp"))
        src.append(batch.repartition(1))  # one delta file, like a real
        # right-sized micro-batch — the refresh-side I/O to count
        # structural metric: the CDF the refresh reads covers ONLY the
        # new commit's files — at toy scale wall-clock contrast drowns
        # in Spark fixed overheads, but the file counts ARE the 100 TB
        # argument (refresh I/O is O(changed files), recompute O(table))
        head = src.version()
        delta_files = sum(
            1
            for a in src._parse_commit(head)
            if "add" in a
        )
        total_files = len(src.snapshot_adds())
        t0 = time.time()
        view.refresh()
        incr = time.time() - t0
        t1 = time.time()
        n_direct = (
            src.read()
            .groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.count("*").alias("n"))
            .count()
        )
        recompute = time.time() - t1
        print(
            json.dumps(
                {
                    "k": k,
                    "table_rows": big.count() + 1000,
                    "changed_rows": 1000,
                    "mv_dims": n_direct,
                    "files_read_by_refresh": delta_files,
                    "files_in_table": total_files,
                    "incremental_refresh_wall_sec": round(incr, 2),
                    "recompute_wall_sec": round(recompute, 2),
                }
            ),
            flush=True,
        )


def main() -> None:
    from data_mastery_pipeline_spark.dedup import components as cc
    from data_mastery_pipeline_spark.dedup import minhash
    from data_mastery_pipeline_spark.session import get_spark

    args = sys.argv[1:]
    if args and args[0] == "--ann":
        ann_probe([int(a) for a in args[1:]] or [1, 4, 16])
        return
    if args and args[0] == "--pq":
        pq_probe([int(a) for a in args[1:]] or [1, 4, 16])
        return
    if args and args[0] == "--cc-diameter":
        cc_diameter_probe([int(a) for a in args[1:]] or [32, 256, 2048])
        return
    if args and args[0] == "--containment":
        containment_probe([int(a) for a in args[1:]] or [1, 4, 16])
        return
    if args and args[0] == "--containment-hot":
        containment_hot_probe([int(a) for a in args[1:]] or [1, 2, 4, 16])
        return
    if args and args[0] == "--mg":
        mg_probe([int(a) for a in args[1:]] or [1, 4, 16])
        return
    if args and args[0] == "--bloom":
        bloom_probe([int(a) for a in args[1:]] or [4, 8, 16])
        return
    if args and args[0] == "--txlog":
        txlog_probe([int(a) for a in args[1:]] or [1, 2, 4])
        return
    if args and args[0] == "--replace":
        replace_probe([int(a) for a in args[1:]] or [1, 2, 4])
        return
    if args and args[0] == "--dv":
        dv_probe([int(a) for a in args[1:]] or [1, 2, 4])
        return
    if args and args[0] == "--assoc":
        assoc_probe([int(a) for a in args[1:]] or [1, 2, 4])
        return
    if args and args[0] == "--countmin":
        countmin_probe([int(a) for a in args[1:]] or [1, 4, 16])
        return
    if args and args[0] == "--ranks-skew":
        ranks_skew_probe([int(a) for a in args[1:]] or [1, 4, 16])
        return
    if args and args[0] == "--spatial":
        spatial_probe([int(a) for a in args[1:]] or [1, 2, 4, 8])
        return
    if args and args[0] == "--mv":
        mv_probe([int(a) for a in args[1:]] or [1, 4, 16])
        return
    ks = [int(a) for a in args] or [1, 4, 16]
    spark = get_spark(app_name="scale_probe")
    # warm JVM + python paths once
    spark.range(10).count()

    for k in ks:
        docs = amplified(spark, k)
        n_docs = docs.count()

        t0 = time.time()
        pairs = minhash.verified_near_dups(
            docs, k=3, num_hashes=64, bands=16, jaccard_threshold=0.35
        )
        n_pairs = pairs.count()
        t_pairs = time.time() - t0

        t1 = time.time()
        clusters = cc.connected_components(
            pairs.select("id_a", "id_b"), "id_a", "id_b"
        )
        n_clusters = clusters.select("component").distinct().count()
        t_cc = time.time() - t1

        print(
            json.dumps(
                {
                    "k": k,
                    "docs": n_docs,
                    "near_dup_pairs": n_pairs,
                    "clusters": n_clusters,
                    "pairs_wall_sec": round(t_pairs, 2),
                    "cc_wall_sec": round(t_cc, 2),
                }
            ),
            flush=True,
        )



def amplified_embeddings(spark, k: int):
    """k× replicas of the embeddings table with a replica-scaled nudge on
    one rotating dimension — vectors stay distinct, geometry stays
    realistic, ids offset per replica."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR).select("vec_id", "embedding")
    n = 10_000_000
    parts = []
    for r in range(k):
        if r == 0:
            parts.append(emb)
            continue
        nudged = F.transform(
            F.col("embedding"),
            lambda x, i: (
                x + F.when(i % 16 == r % 16, F.lit(0.01 * r)).otherwise(F.lit(0.0))
            ).cast("float"),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                nudged.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cc_diameter_probe(diameters) -> None:
    """Connected-components round/jump growth on the ADVERSARIAL shape:
    a path graph of diameter d (every near-dup operator's worst case —
    a chain of pairwise-similar docs with no common ancestor). With
    pointer doubling to fixpoint a path converges in ONE round and
    ⌈log₂ d⌉+1 jumps; rounds growing with d instead would mean the
    linear-convergence regression is back (each round is a full
    materialization cycle, so rounds are the expensive axis)."""
    import math

    from data_mastery_pipeline_spark.dedup import components as cc
    from data_mastery_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_cc", shuffle_partitions=8)
    spark.range(10).count()

    for d in diameters:
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(d)], "id_a long, id_b long"
        ).coalesce(8)
        t0 = time.time()
        # finish_threshold=0: the probe audits the DISTRIBUTED doubling
        # path — the default bounded driver finish would absorb these
        # small graphs entirely and hide a convergence regression
        labels = cc.connected_components(edges, finish_threshold=0)
        n_comp = labels.select("component").distinct().count()
        stats = list(cc.LAST_RUN_STATS)
        print(
            json.dumps(
                {
                    "probe": "cc_diameter",
                    "diameter": d,
                    "components": n_comp,
                    "rounds": len(stats),
                    "jumps_total": sum(s.get("jumps", 0) for s in stats),
                    "jump_bound": math.ceil(math.log2(d)) + 1,
                    "wall_sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )


def ann_probe(ks) -> None:
    """Brute vs IVF top-k latency + IVF recall under k× amplification —
    the similarity-family twin of the dedup probe. Brute is O(n) per
    query by design (the recall baseline); IVF probes n_probes/n_cells
    of the data, so its wall time should grow far slower than brute's."""
    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.similarity import brute, ivf

    spark = get_spark(app_name="scale_probe_ann")
    spark.range(10).count()
    query = [0.1] * 64

    for k in ks:
        emb = amplified_embeddings(spark, k).localCheckpoint()
        n_vecs = emb.count()

        t0 = time.time()
        exact = [r["vec_id"] for r in brute.cosine_topk(emb, query, k=10).collect()]
        t_brute = time.time() - t0

        cents = ivf.train_centroids(emb, n_cells=16)
        out = {"probe": "ann", "k": k, "vectors": n_vecs,
               "brute_wall_sec": round(t_brute, 2)}
        # recall is the n_probes knob: report the curve, not one point
        for n_probes in (4, 8, 12):
            t1 = time.time()
            approx = [
                r["vec_id"]
                for r in ivf.ivf_topk(
                    emb, cents, query, k=10, n_probes=n_probes
                ).collect()
            ]
            out[f"ivf_wall_sec_p{n_probes}"] = round(time.time() - t1, 2)
            out[f"ivf_recall_p{n_probes}"] = len(set(exact) & set(approx)) / 10.0

        print(json.dumps(out), flush=True)




def pq_probe(ks) -> None:
    """IVF-PQ's scale claim, measured: as the table grows k×, the ADC
    stage's input (codes rows in the probed cells) grows with the
    data, but the EXACT-RE-RANK input — the only full-vector reads —
    stays pinned at the k_top·refine shortlist (measured by counting
    the rows that flow into the re-rank join, not assumed). Recall vs
    brute is reported alongside so the bound isn't bought with quality.

    Recall caveat this probe EXPECTS: the amplification nudges one
    dimension by 0.01·r, BELOW the 4×16 product quantizer's
    resolution — every replica family shares identical codes, ADC ties
    across them, and the shortlist admits ~shortlist/replicas distinct
    families. That is the textbook PQ failure mode (sub-resolution
    neighbors are indistinguishable until re-rank) and the knob is
    ``refine``, not n_probes — on real data the driver query's recall
    certificate (ann_ivfpq_topk, unreplicated) is the quality gate."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.dedup.embedding import cosine
    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.similarity import brute, ivf, pq

    spark = get_spark(app_name="scale_probe_pq")
    spark.range(10).count()
    query = [0.1] * 64
    K_TOP, REFINE, N_PROBES = 10, 6, 4

    for k in ks:
        emb = amplified_embeddings(spark, k).localCheckpoint()
        n_vecs = emb.count()
        t0 = time.time()
        exact = [
            r["vec_id"] for r in brute.cosine_topk(emb, query, k=K_TOP).collect()
        ]
        t_brute = time.time() - t0

        cents = ivf.train_centroids(emb, n_cells=16)
        books = pq.train_pq(emb, cents, m=4, ksub=16)
        codes = pq.encode_pq(emb, cents, books).localCheckpoint()

        # ADC input: codes rows in the probed cells (grows with data)
        probes = ivf._probe_cells(query, cents, N_PROBES)
        adc_rows = codes.filter(F.col("cell").isin(probes)).count()

        # re-rank input: the rows the broadcast shortlist join admits —
        # the MEASURED full-vector read count (the scale claim)
        shortlist = pq.adc_shortlist(
            codes, cents, books, query, K_TOP * REFINE, N_PROBES
        )
        rerank_rows = emb.join(
            F.broadcast(shortlist.select("vec_id")), "vec_id"
        ).count()
        out = {
            "probe": "pq",
            "k": k,
            "vectors": n_vecs,
            "adc_rows": adc_rows,
            "rerank_rows_bound": K_TOP * REFINE,
            "rerank_join_rows": rerank_rows,
            "brute_wall_sec": round(t_brute, 2),
        }
        # recall is the n_probes knob (the amplified replicas pack the
        # exact top-k into few cells — adversarial for low coverage):
        # report the curve, matching ann_probe's convention
        for n_probes in (4, 8, 12):
            t1 = time.time()
            approx = [
                r["vec_id"]
                for r in pq.ivfpq_topk(
                    codes, emb, cents, books, query,
                    k=K_TOP, n_probes=n_probes, refine=REFINE,
                ).collect()
            ]
            out[f"pq_wall_sec_p{n_probes}"] = round(time.time() - t1, 2)
            out[f"pq_recall_p{n_probes}"] = (
                len(set(exact) & set(approx)) / K_TOP
            )
        print(json.dumps(out), flush=True)


def containment_probe(ks) -> None:
    """Containment-dedup amplification: marker-perturbed replicas break
    3-grams, so a replica never shares grams with its source — every
    containment pair lives INSIDE one replica generation, and the pair
    count must scale exactly ×k. Linear wall growth (or better, while
    fixed job overhead dominates locally) is the evidence that the gram
    join's cost tracks data volume, not pair volume."""
    import time as _t

    from data_mastery_pipeline_spark.parallelism import fan_out
    from data_mastery_pipeline_spark.queries_adv import containment_pairs_df
    from data_mastery_pipeline_spark.session import get_spark

    spark = get_spark(app_name="containment_probe")
    spark.range(10).count()
    base_pairs = None
    for k in ks:
        docs = fan_out(amplified(spark, k)).localCheckpoint()
        # the SHIPPED operator, uncapped (same rule as the hot probe:
        # measure the real gram build + scoring, never a parallel
        # reimplementation that can drift — review r6)
        t0 = _t.time()
        pairs, _ = containment_pairs_df(docs, max_gram_df=None, threshold=0.8)
        n_pairs = pairs.count()
        wall = _t.time() - t0
        if base_pairs is None:
            base_pairs = n_pairs
        print(
            json.dumps(
                {
                    "probe": "containment",
                    "k": k,
                    "docs": docs.count(),
                    "pairs": n_pairs,
                    "pairs_over_base": round(n_pairs / max(base_pairs, 1), 3),
                    "wall_sec": round(wall, 2),
                }
            ),
            flush=True,
        )


def containment_hot_probe(ks) -> None:
    """VERDICT r05 task 2: the marker-perturbation probe above is BLIND
    to hot grams (replicas never share grams across generations), so
    this variant INJECTS shared boilerplate — every document in every
    generation gets the same trailing sentence, giving its 3-grams
    df = n_docs. Uncapped, each boilerplate gram emits n_docs² gram-join
    rows (quadratic in k); with the max_gram_df cap they are dropped
    before the join, so both the gram-join row count and the qualifying
    pair count must scale ~×k. Both arms run the SHIPPED operator
    (queries_adv.containment_pairs_df), not a reimplementation."""
    import time as _t

    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.parallelism import fan_out
    from data_mastery_pipeline_spark.queries_adv import containment_pairs_df
    from data_mastery_pipeline_spark.session import get_spark

    boiler = "all rights reserved subscribe to our newsletter terms apply"
    spark = get_spark(app_name="containment_hot_probe")
    spark.range(10).count()
    base_docs = amplified(spark, 1).count()
    for k in ks:
        docs = fan_out(
            amplified(spark, k).withColumn(
                "text", F.concat_ws(" ", F.trim(F.col("text")), F.lit(boiler))
            )
        ).localCheckpoint()
        n_docs = docs.count()
        out = {"probe": "containment_hot", "k": k, "docs": n_docs}
        # cap chosen between the per-generation replica df (< base doc
        # count) and the injected boilerplate df (= n_docs): drops the
        # boilerplate grams and ONLY them
        cap = base_docs - 1
        for label, gdf in (("capped", cap), ("uncapped", None)):
            if label == "uncapped" and k > 4:
                out["uncapped_skipped"] = "quadratic arm capped at k<=4"
                continue  # n_docs² join rows: demonstrate small, don't DOS the host
            t0 = _t.time()
            pairs, n_hot = containment_pairs_df(
                docs, gdf, count_dropped=(gdf is not None)
            )
            out[f"{label}_pairs"] = pairs.count()
            out[f"{label}_wall_sec"] = round(_t.time() - t0, 2)
            # the quadratic signal lives in the INTERMEDIATE gram-join
            # row count (Σ df(g)² — the 0.8 output threshold hides it);
            # containment_grams IS the shipped gram build, so the probe
            # cannot drift from the operator
            from data_mastery_pipeline_spark.queries_adv import containment_grams

            g2 = containment_grams(docs, gdf)
            out[f"{label}_gram_join_rows"] = (
                g2.alias("a")
                .join(g2.alias("b"), "g")
                .filter(F.col("a.doc_id") != F.col("b.doc_id"))
                .count()
            )
            if label == "capped":
                out["hot_grams_dropped"] = n_hot
        print(json.dumps(out), flush=True)




def txlog_probe(ks) -> None:
    """Blast-radius amplification probe for the transaction log
    (sources/txlog.py): grow the TABLE k× with appends whose value
    ranges are DISJOINT from a fixed delete predicate, then measure the
    delete. The scale claim under test: rewritten files / rewritten
    rows are a function of the MATCHING data only — constant as the
    table grows — while a snapshot-rewrite store (versioned.py) pays
    O(table). Also prints the stats-pruned scan ratio at each k (reads
    a constant file count from a growing table)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.sources.txlog import TxTable

    spark = get_spark(app_name="scale_probe_txlog")
    spark.range(10).count()
    n_rows_per_file = 5_000

    def batch(lo_val: float, tag: int):
        return (
            spark.range(n_rows_per_file)
            .select(
                (F.col("id") + tag * n_rows_per_file).alias("k"),
                F.lit(f"t{tag}").alias("grp"),
                (F.col("id") % 100 + F.lit(lo_val)).alias("v"),
            )
            .coalesce(1)
        )

    for k in ks:
        root = tempfile.mkdtemp(prefix="txlog_probe_") + "/tbl"
        try:
            # one file inside the predicate range [0, 100) ...
            t = TxTable.create(spark, root, batch(0.0, 0))
            # ... and 4*k files far outside it (the growing table)
            tag = 1
            for _ in range(4 * k):
                t.append(batch(1_000.0 + 200.0 * tag, tag))
                tag += 1
            files_before = len(t.snapshot_adds())
            _, scan_stats = t.scan({"v": (0.0, 99.0)})
            t0 = time.time()
            t.delete_where("v", 0.0, 99.0)
            wall = time.time() - t0
            hist = t.history()[-1]
            print(
                json.dumps(
                    {
                        "k": k,
                        "table_files": files_before,
                        "table_rows": (4 * k + 1) * n_rows_per_file,
                        "scan_files_read": scan_stats["files_read"],
                        "delete_files_rewritten": hist["n_removes"],
                        "delete_wall_sec": round(wall, 2),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(os.path.dirname(root), ignore_errors=True)




def dv_probe(ks) -> None:
    """Merge-on-read cost probe (deletion vectors): a predicate hitting
    1% of EVERY file forces rewrite-mode to rewrite the whole table,
    while dv-mode writes only the matched positions. The scale claim
    under test: bytes written by a dv delete track MATCHED ROWS (tiny,
    constant per row), bytes written by a rewrite track TOUCHED FILE
    BYTES (the whole table here) — so the dv/rewrite byte ratio stays
    ~constant and small as the table grows k×, which is exactly the
    100 TB argument for merge-on-read."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.sources.txlog import TxTable

    spark = get_spark(app_name="scale_probe_dv")
    spark.range(10).count()
    n_rows_per_file = 5_000

    def batch(tag: int):
        return (
            spark.range(n_rows_per_file)
            .select(
                (F.col("id") + tag * n_rows_per_file).alias("k"),
                F.lit(f"t{tag}").alias("grp"),
                (F.col("id") % 100).cast("double").alias("v"),
            )
            .coalesce(1)
        )

    for k in ks:
        stats = {}
        for mode in ("rewrite", "dv"):
            root = tempfile.mkdtemp(prefix="dv_probe_") + "/tbl"
            try:
                t = TxTable.create(spark, root, batch(0))
                for tag in range(1, 4 * k):
                    t.append(batch(tag))
                t0 = time.time()
                t.delete_where("v", 0.0, 0.0, mode=mode)  # 1% of every file
                wall = time.time() - t0
                actions = t._parse_commit(t.version())
                if mode == "rewrite":
                    written = sum(a["add"]["size"] for a in actions if "add" in a)
                    touched = sum(1 for a in actions if "remove" in a)
                else:
                    dv = next(a["dv"] for a in actions if "dv" in a)
                    written = sum(
                        os.path.getsize(os.path.join(root, p))
                        for p in dv["paths"]
                    )
                    touched = len(dv["files"])
                stats[mode] = {
                    "bytes_written": written,
                    "files_touched": touched,
                    "wall_sec": round(wall, 2),
                }
            finally:
                shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        print(
            json.dumps(
                {
                    "probe": "dv_delete_cost",
                    "k": k,
                    "table_files": 4 * k,
                    "matched_rows": 4 * k * (n_rows_per_file // 100),
                    "rewrite": stats["rewrite"],
                    "dv": stats["dv"],
                    "dv_over_rewrite_bytes": round(
                        stats["dv"]["bytes_written"]
                        / max(stats["rewrite"]["bytes_written"], 1),
                        4,
                    ),
                }
            ),
            flush=True,
        )



def mg_probe(ks) -> None:
    """Misra-Gries heavy-hitters scale claim MEASURED: pass-1 output is
    O(P·cap) rows regardless of stream size, while the exact top-20 by
    recount stays value-equal to the full groupBy at every
    amplification. The moved-data column is the claim: a groupBy
    shuffles one row per (distinct token, map partition); MG moves
    ≤ cap+1 rows per partition, period."""
    import time

    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.operators import heavy
    from data_mastery_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_mg")
    spark.range(10).count()
    CAP, K = 1024, 20
    for k in ks:
        # synthetic long-tail stream — the regime MG exists for (the
        # corpus has only ~46 distinct tokens, which a groupBy handles
        # trivially): 10 hot tokens at n/20 occurrences each, plus a
        # UNIQUE tail token per remaining row, so distinct ≈ n/2 and
        # the groupBy's shuffle carries the key space itself
        n = 50_000 * k
        toks = (
            spark.range(n)
            .select(
                F.when(
                    F.col("id") % 2 == 0,
                    F.concat(
                        F.lit("hot"),
                        ((F.col("id") / 2).cast("long") % 25).cast("string"),
                    ),
                )
                .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
                .alias("tok")
            )
            .repartition(32)
            .localCheckpoint()
        )
        n_stream = toks.count()
        n_distinct = toks.distinct().count()
        summary = heavy.mg_summarize(toks, "tok", CAP)
        n_pass1 = summary.count()
        t0 = time.time()
        got = heavy.exact_topk(toks, "tok", k=K, cap=CAP).collect()
        t_mg = round(time.time() - t0, 2)
        t0 = time.time()
        exact = (
            toks.groupBy("tok").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.col("tok")).limit(K).collect()
        )
        t_gb = round(time.time() - t0, 2)
        equal = [(r["tok"], r["n"]) for r in got] == [
            (r["tok"], r["n"]) for r in exact
        ]
        print(json.dumps({
            "probe": "mg", "k": k, "stream_rows": n_stream,
            "distinct_tokens": n_distinct, "pass1_rows": n_pass1,
            "cap": CAP, "topk_equal_exact": equal,
            "guarantee_ok": bool(got and got[0]["guarantee_ok"]),
            "mg_wall_sec": t_mg, "groupby_wall_sec": t_gb,
        }))


def bloom_probe(ks) -> None:
    """Bloom file-skipping scale claim MEASURED: as the table grows
    (more unclustered files), a point lookup's files_read stays O(1)
    under the bloom index while range stats alone read everything —
    the files_read column vs files_total IS the claim."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.sources.txlog import TxTable

    spark = get_spark(app_name="scale_probe_bloom")
    spark.range(10).count()
    for n_files in ks:
        root = tempfile.mkdtemp(prefix="bloomprobe_")
        try:
            n_rows = 5000 * n_files
            base = spark.range(n_rows).select(
                F.col("id").alias("k"),
                (F.col("id") % 97).cast("double").alias("v"),
            )
            # chunk by k % n_files: every file spans ~the full key range
            t = TxTable.create(
                spark, os.path.join(root, "tbl"),
                base.filter(F.col("k") % n_files == 0).coalesce(1),
                stat_cols=["k", "v"],
            )
            for c in range(1, n_files):
                t.append(
                    base.filter(F.col("k") % n_files == c).coalesce(1)
                )
            probe = n_rows // 2 + 1
            df0, st0 = t.scan({"k": (probe, probe)})  # stats only
            t0 = time.time()
            t.build_bloom_index("k", fpp=0.001)
            t_build = round(time.time() - t0, 2)
            df1, st1 = t.scan({"k": (probe, probe)})
            n_hit = df1.count()
            print(json.dumps({
                "probe": "bloom", "files_total": st1["files_total"],
                "rows": n_rows,
                "files_read_stats_only": st0["files_read"],
                "files_read_with_bloom": st1["files_read"],
                "files_bloom_pruned": st1["files_bloom_pruned"],
                "rows_found": n_hit,
                "index_build_sec": t_build,
            }))
        finally:
            shutil.rmtree(root, ignore_errors=True)



def replace_probe(ks) -> None:
    """Blast-radius probe for replace_where (r8): a FIXED one-slice
    daily re-load replaces the same value range while the table grows
    k× with appends disjoint from the slice. The scale claim under
    test: files rewritten by the replace are a function of the SLICE
    only — constant as the table grows — because stats pruning bounds
    the keep-side rewrite exactly like delete_where (the Delta
    replaceWhere cost model). Run: python tools/scale_probe.py
    --replace 1 2 4"""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.sources.txlog import TxTable

    spark = get_spark(app_name="scale_probe_replace")
    spark.range(10).count()
    n_rows_per_file = 5_000

    def batch(lo_val: float, tag: int):
        return (
            spark.range(n_rows_per_file)
            .select(
                (F.col("id") + tag * n_rows_per_file).alias("k"),
                F.lit(f"t{tag}").alias("grp"),
                (F.col("id") % 100 + F.lit(lo_val)).alias("v"),
            )
            .coalesce(1)
        )

    def load(tag: int):
        # the corrected slice: 1000 rows, all inside [0, 100)
        return (
            spark.range(1_000)
            .select(
                (F.col("id") + 10_000_000 + tag * 1_000).alias("k"),
                F.lit("reload").alias("grp"),
                (F.col("id") % 100).cast("double").alias("v"),
            )
            .coalesce(1)
        )

    for k in ks:
        root = tempfile.mkdtemp(prefix="replace_probe_") + "/tbl"
        try:
            t = TxTable.create(spark, root, batch(0.0, 0))  # in-slice file
            tag = 1
            for _ in range(4 * k):  # the growing out-of-slice table
                t.append(batch(1_000.0 + 200.0 * tag, tag))
                tag += 1
            files_before = len(t.snapshot_adds())
            t0 = time.time()
            t.replace_where("v", 0.0, 99.0, load(k))
            wall = time.time() - t0
            hist = t.history()[-1]
            print(
                json.dumps(
                    {
                        "k": k,
                        "table_files": files_before,
                        "table_rows": (4 * k + 1) * n_rows_per_file,
                        "replace_files_rewritten": hist["n_removes"],
                        "replace_wall_sec": round(wall, 2),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(os.path.dirname(root), ignore_errors=True)


def assoc_probe(ks) -> None:
    """association_rules scale claim MEASURED: replicating the basket
    relation k× (disjoint order keys, same per-basket size ≤7) grows
    the candidate PAIR count linearly — the Apriori semi-join keeps
    the quadratic term bounded by basket size, never corpus size."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.tables import load_table

    spark = get_spark(app_name="assoc_probe")
    spark.range(10).count()
    stride = 100_000_000
    for k in ks:
        li = load_table(spark, "lineitem", SF_DIR).select(
            "l_orderkey", "l_partkey"
        )
        parts = [li] + [
            li.select(
                (F.col("l_orderkey") + r * stride).alias("l_orderkey"),
                "l_partkey",
            )
            for r in range(1, k)
        ]
        items = parts[0]
        for p in parts[1:]:
            items = items.unionByName(p)
        items = items.select(
            F.col("l_orderkey").alias("basket"),
            F.col("l_partkey").alias("item"),
        ).distinct()
        n_baskets = items.select("basket").distinct().count()
        freq = (
            items.groupBy("item")
            .agg(F.count("*").alias("n_item"))
            .filter(F.col("n_item") >= 3)
        )
        fitems = items.join(freq, "item")
        t0 = time.time()
        a = fitems.select("basket", F.col("item").alias("pa"))
        b = fitems.select("basket", F.col("item").alias("pb"))
        n_pairs = (
            a.join(b, "basket")
            .filter(F.col("pa") < F.col("pb"))
            .count()
        )
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "k": k,
                    "baskets": n_baskets,
                    "candidate_pairs": n_pairs,
                    "pairs_per_basket": round(n_pairs / n_baskets, 2),
                    "pair_wall_sec": round(wall, 2),
                }
            ),
            flush=True,
        )


def countmin_probe(ks) -> None:
    """Count-Min scale claim MEASURED: the counter table stays ≤ d·w
    rows while the token stream grows k× (the sketch's whole point —
    shuffle and state bounded regardless of stream size), and the
    top-20 estimates stay exact-or-over with bounded overshoot."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.functions import text as textfn
    from data_mastery_pipeline_spark.operators import sketches
    from data_mastery_pipeline_spark.session import get_spark

    spark = get_spark(app_name="countmin_probe")
    spark.range(10).count()
    D, W = 4, 256
    for k in ks:
        docs = amplified(spark, k)
        toks = docs.select(F.explode(textfn.tokens("text")).alias("tok"))
        n_occ = toks.count()
        t0 = time.time()
        counters = sketches.countmin_counters(toks, "tok", D, W)
        n_cells = counters.count()
        t_build = time.time() - t0
        top = (
            toks.groupBy("tok")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "tok")
            .limit(20)
        )
        est = sketches.countmin_estimate(counters, top, "tok", D, W)
        j = top.join(est, "tok").select(
            F.sum(F.when(F.col("cm_est") < F.col("n"), 1).otherwise(0)).alias(
                "under"
            ),
            F.max(F.col("cm_est") - F.col("n")).alias("max_over"),
        ).first()
        print(
            json.dumps(
                {
                    "k": k,
                    "occurrences": n_occ,
                    "counter_cells": n_cells,
                    "cells_bound": D * W,
                    "undercounts": j["under"],
                    "max_overshoot": int(j["max_over"]),
                    "eps_n_bound": round(2.718281828 / W * n_occ, 1),
                    "build_wall_sec": round(t_build, 2),
                }
            ),
            flush=True,
        )


def ranks_skew_probe(ks) -> None:
    """The ranks hot-bucket claim MEASURED: a 60%-one-key dataset (the
    degenerate case the module header documents) growing k×. The
    unsalted rank-semantics form funnels the hot key into ONE window
    task (its per-row cost grows with k); the salted row_number variant
    keeps the largest window bucket a small, k-stable fraction of the
    hot key — the evidence that the hot-key case stays parallel."""
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.operators import ranks
    from data_mastery_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ranks_skew_probe")
    spark.range(10).count()
    base_n = 200_000
    for k in ks:
        n = base_n * k
        df = (
            spark.range(n)
            .select(
                F.col("id"),
                F.when((F.col("id") * 2654435761 % 10) < 6, F.lit(42.0))
                .otherwise((F.col("id") % 97).cast("double"))
                .alias("v"),
            )
            .localCheckpoint()
        )
        order = [("v", "asc"), ("id", "asc")]
        t0 = time.time()
        unsalted = ranks.with_global_row_number(df, order, out="rn")
        unsalted.write.format("noop").mode("overwrite").save()
        t_unsalted = time.time() - t0
        ranks._SALTED_BUCKET_PROBE = probe = []
        try:
            t0 = time.time()
            salted = ranks.with_global_row_number_salted(df, order, out="rn")
            salted.write.format("noop").mode("overwrite").save()
            t_salted = time.time() - t0
        finally:
            ranks._SALTED_BUCKET_PROBE = None
        hist = probe[0]
        n_hot = df.filter("v = 42.0").count()
        print(
            json.dumps(
                {
                    "k": k,
                    "rows": n,
                    "hot_rows": n_hot,
                    "unsalted_wall_sec": round(t_unsalted, 2),
                    "salted_wall_sec": round(t_salted, 2),
                    "salted_buckets": len(hist),
                    "salted_max_bucket": max(hist.values()),
                    "salted_max_bucket_share_of_hot": round(
                        max(hist.values()) / n_hot, 3
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
