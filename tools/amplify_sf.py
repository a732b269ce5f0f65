#!/usr/bin/env python
"""Deterministic k× amplification of a testdata scale factor — the
sf1-equivalent corpus for scale-GROWTH measurement (r9 verdict task:
no full-headline run existed at 10× data; /root/testdata is read-only
and ships no sf1).

Each fact table is replicated k× with consistent key OFFSETS applied
to every key column of the same domain (orderkey/custkey/partkey/
suppkey/user_id/event_id/doc_id/vec_id), so FK joins keep their
selectivity: a fact row's replica i joins exactly its dimension's
replica i — join outputs grow k×, never k². nation/region stay as-is
(nationkey domains are NOT offset — customers-per-nation grows k×,
the realistic scale-up). Timestamps/dates keep their range: volume
per day grows k×, which is how real data scales.

documents.text gets a replica-marker token interleaved every 3 tokens
for replicas > 0 (the tools/scale_probe.py amplification): verbatim
replication would make every doc a 10-way exact duplicate and blow
the near-dup pair count up k²-style — an artifact, not a workload.
The marker breaks ~83% of 3-shingles, so the near-dup STRUCTURE
replicates linearly while the corpus grows k×. embeddings keep their
vectors (identical twins across replicas are harmless to ANN timing)
but offset vec_id.

Usage:  python tools/amplify_sf.py [k] [src_dir] [dst_dir]
Defaults: k=10, src=/root/testdata/sf0.1, dst=/tmp/sfamp_<k>x
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one offset per key DOMAIN — far above any real key at sf0.1
OFF = {
    "orderkey": 10_000_000,
    "custkey": 10_000_000,
    "partkey": 10_000_000,
    "suppkey": 10_000_000,
    "user_id": 10_000_000,
    "event_id": 100_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}

KEYS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

COPY_AS_IS = ("region", "nation")


def main() -> None:
    from pyspark.sql import functions as F

    from data_mastery_pipeline_spark.session import get_spark
    from data_mastery_pipeline_spark.tables import load_table

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sfamp_{k}x"
    os.makedirs(dst, exist_ok=True)
    spark = get_spark(app_name="amplify_sf")

    for t in COPY_AS_IS:
        load_table(spark, t, src).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"_{t}"))
        _promote(dst, t)
        print(f"{t}: copied", flush=True)

    for t, keys in KEYS.items():
        t0 = time.time()
        df = load_table(spark, t, src)
        reps = []
        for i in range(k):
            r = df
            for col, domain in keys.items():
                r = r.withColumn(
                    col, (F.col(col) + F.lit(i * OFF[domain])).cast("long")
                )
            if t == "documents" and i > 0:
                # break shingles: interleave a replica marker token
                # every 3 tokens (the scale_probe amplification)
                marker = F.lit(f"zzrep{i}zz")
                toks = F.split(F.trim(F.col("text")), r"\s+")
                r = r.withColumn(
                    "text",
                    F.array_join(
                        F.flatten(
                            F.transform(
                                toks,
                                lambda x, j: F.when(
                                    j % 3 == 2, F.array(x, marker)
                                ).otherwise(F.array(x)),
                            )
                        ),
                        " ",
                    ),
                )
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.repartition(8).write.mode("overwrite").parquet(
            os.path.join(dst, f"_{t}")
        )
        _promote(dst, t)
        print(f"{t}: x{k} in {time.time() - t0:.1f}s", flush=True)
    print(f"amplified {k}x testdata at {dst}", flush=True)


def _promote(dst: str, t: str) -> None:
    """Collapse the Spark output dir into the single-file layout
    load_table expects (<dst>/<t>.parquet)."""
    import glob
    import shutil

    outdir = os.path.join(dst, f"_{t}")
    parts = sorted(glob.glob(os.path.join(outdir, "*.parquet")))
    dest = os.path.join(dst, f"{t}.parquet")
    if len(parts) == 1:
        shutil.move(parts[0], dest)
        shutil.rmtree(outdir, ignore_errors=True)
    else:
        # multi-part: merge footer-compatibly via pyarrow (row groups
        # are appended, no decode/re-encode of pages)
        import pyarrow.parquet as pq

        first = pq.ParquetFile(parts[0])
        with pq.ParquetWriter(dest, first.schema_arrow) as w:
            for p in parts:
                w.write_table(pq.read_table(p))
        shutil.rmtree(outdir, ignore_errors=True)


if __name__ == "__main__":
    main()
