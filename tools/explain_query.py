#!/usr/bin/env python
"""Dump .explain("formatted") for named registered queries to files.

Usage: python tools/explain_query.py <out_dir> <suffix> q1 [q2 ...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Construction runs
at sf0.01 (lifecycle queries execute their internal actions during
construction; the captured plan is the returned contract frame's).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from data_mastery_pipeline_spark.allqueries import register_all

    register_all()
    from data_mastery_pipeline_spark.registry import QUERIES
    from data_mastery_pipeline_spark.session import get_spark

    spark = get_spark(app_name="explain_query", shuffle_partitions=8)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
