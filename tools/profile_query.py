#!/usr/bin/env python
"""Profile a single registered query end-to-end (driver-side attribution).

Usage: python tools/profile_query.py <query_name> [sf_dir]

Runs the query once to warm (JVM/codegen/Python workers), then a second
time under cProfile with the noop sink, and prints the top call sites by
cumulative time. In local mode the driver blocks on py4j for every
action, so cumtime on our own package functions attributes wall time to
the engine call that paid it (txlog commit, MV refresh, stream drain...).
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    name = sys.argv[1]
    from data_mastery_pipeline_spark.allqueries import register_all

    register_all()
    from data_mastery_pipeline_spark.registry import QUERIES
    from data_mastery_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"profile_{name}")
    # warm path exactly like bench.py
    QUERIES["pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(2).toDF("x").mapInPandas(lambda it: it, "x long").write.format(
        "noop"
    ).mode("overwrite").save()

    def run() -> float:
        t = time.time()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t

    w = run()  # warm run (class loading, codegen)
    print(f"warm run: {w:.3f}s", flush=True)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    df = QUERIES[name](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    prof.disable()
    print(f"profiled run: {time.time() - t0:.3f}s", flush=True)

    buf = io.StringIO()
    st = pstats.Stats(prof, stream=buf)
    st.sort_stats("cumulative")
    st.print_stats(60)
    out = buf.getvalue()
    # drop the boilerplate header lines of pstats output
    print(out)


if __name__ == "__main__":
    main()
