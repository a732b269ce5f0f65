"""Source-parallelism guard for CPU-heavy narrow stages.

A parquet scan's task count is bounded by its SPLIT count (row groups /
file ranges). When a CPU-heavy narrow projection (MinHash folds,
SimHash fingerprints, gram explosion, per-pair edit distance) sits
directly on a scan with fewer splits than the cluster has slots, the
whole stage serializes on those few cores while the rest idle — the
classic pathology of a few huge gzip files, and exactly what this
repo's single-row-group testdata files reproduce locally (every sf0.1
table is ONE row group → every scan is ONE task).

``fan_out`` repartitions ONLY in that case: if the source already
arrives with enough splits (any healthy 100 TB layout), it is a no-op
and costs nothing — the adaptive form of the bare
``.repartition(defaultParallelism)`` pattern (dedup/ngram.py:158).
The repartition shuffles the raw input once; that is worth it precisely
when the downstream per-row work dominates, which is the only time this
helper should be applied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff its current plan
    would execute on fewer than ``min_factor ×`` that many partitions.
    Reading the partition count converts the plan to an RDD (no job is
    triggered)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target * min_factor:
        return df.repartition(target)
    return df
