#!/usr/bin/env python
"""Cached-block high-water probe (r9 verdict task 3).

Runs named registry queries at $SPARK_GRAFT_SF_DIR while sampling the
JVM block manager (getRDDStorageInfo) from a background thread, and
prints ONE JSON line per query with the high-water marks:

  {"query": ..., "wall_sec": ..., "hw_mem_bytes": ..., "hw_disk_bytes": ...,
   "levels": [storage-level descriptions seen]}

The point: after checkpointing.truncate_lineage(footprint="data")
stores data-sized frames SERIALIZED with disk spill, on-heap cached
mass must stay bounded by the storage pool — heap never scales with
data. Run this at sf0.1 and at the 10× amplified dir and compare
hw_mem_bytes: bounded ⇒ the fix holds; see SCALING.md for the
captured numbers.

Usage: python tools/ckpt_probe.py [query ...]   (default: epoch_shuffle
near_dup_clusters — the two heaviest data-sized checkpoint users)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from data_mastery_pipeline_spark.allqueries import register_all

    register_all()
    from data_mastery_pipeline_spark.registry import QUERIES
    from data_mastery_pipeline_spark.session import get_spark

    names = sys.argv[1:] or ["epoch_shuffle", "near_dup_clusters"]
    spark = get_spark(app_name="ckpt_probe")
    jsc = spark.sparkContext._jsc.sc()

    for name in names:
        hw = {"mem": 0, "disk": 0}
        levels: set[str] = set()
        stop = threading.Event()

        def sample() -> None:
            while not stop.is_set():
                try:
                    # SUM concurrently-cached RDDs per tick, then max
                    # over ticks: queries that hold several data-sized
                    # frames at once (epoch_shuffle's base + prior-call
                    # remnants, CC's per-round pair) would otherwise
                    # under-report total cached heap (review r10)
                    mem = disk = 0
                    for info in jsc.getRDDStorageInfo():
                        mem += info.memSize()
                        disk += info.diskSize()
                        levels.add(info.storageLevel().description())
                    hw["mem"] = max(hw["mem"], mem)
                    hw["disk"] = max(hw["disk"], disk)
                except Exception:
                    pass  # py4j race during block teardown — skip tick
                time.sleep(0.2)

        t = threading.Thread(target=sample, daemon=True)
        t.start()
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        stop.set()
        t.join(timeout=2)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": SF_DIR,
                    "wall_sec": round(wall, 2),
                    "hw_mem_bytes": hw["mem"],
                    "hw_disk_bytes": hw["disk"],
                    "levels": sorted(levels),
                }
            )
        )


if __name__ == "__main__":
    main()
