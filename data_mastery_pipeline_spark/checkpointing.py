"""Lineage truncation for iterative / fan-out DataFrame pipelines.

Two tiers, one switch:

- ``checkpoint_dir=None`` → ``localCheckpoint``: materializes to executor
  block storage. Fast (no DFS write), but the blocks live on the
  executors that computed them — **an executor loss loses the blocks and
  kills every consumer of the checkpointed frame**. Right for local[] /
  test runs and short-lived fan-outs.
- ``checkpoint_dir="hdfs://…/ckpt"`` → reliable ``checkpoint()``: writes
  the RDD to the (fault-tolerant) checkpoint filesystem, so iteration
  state survives executor churn. This is the production setting for
  multi-round algorithms (connected components) on a real cluster, where
  a 1000-executor job WILL lose executors mid-iteration.

The checkpoint dir is set once per SparkContext (Spark keeps it global);
passing different dirs in one session keeps the first and warns via
Spark's own semantics — pin one dir per job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def truncate_lineage(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    footprint: str = "bounded",
) -> DataFrame:
    """Materialize ``df`` and cut its logical plan (see module docstring
    for the local-vs-reliable trade-off). Eager in both modes: the frame
    is computed here, consumers read blocks/files.

    ``footprint`` declares how the checkpointed frame scales (r9
    verdict task 3 — the 10× capture GC-thrashed a 16 g heap on a
    DESERIALIZED localCheckpoint cache, and a heap that must grow with
    data is wrong on ANY single node):

    - ``"bounded"`` (default): the frame is O(partitions)/O(groups)/
      O(sketch) — NOT O(data). Spark's default local-checkpoint level
      (MEMORY_AND_DISK_DESER) is fine: fast object reads, trivial mass.
    - ``"data"``: the frame is data-sized (a shuffled corpus, per-doc
      signatures, an edge list). Stored SERIALIZED with disk spill
      (MEMORY_AND_DISK): blocks live in the unified storage pool — a
      FIXED fraction of the heap — and evict to local disk beyond it,
      so heap usage is bounded by the pool no matter the data volume,
      and the block mass is a few byte arrays instead of millions of
      live row objects (the GC-thrash mechanism). Warm reads stay
      memory-speed while the frame fits; past the pool the cost is a
      local-disk read, not a GC death spiral.

    Callers checkpointing anything that grows with the input MUST pass
    ``footprint="data"`` — tests/test_plan_hygiene pins the known
    data-sized sites.
    """
    if footprint not in ("bounded", "data"):
        raise ValueError(f"footprint must be 'bounded' or 'data', got {footprint!r}")
    if checkpoint_dir is None:
        if footprint == "data":
            return df.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint()


def release(df: DataFrame, checkpoint_dir: str | None = None) -> None:
    """Free a superseded checkpoint's storage NOW. The df must be a
    frame returned by :func:`truncate_lineage` that no consumer will
    read again — after release it is unreadable (the blocks are gone;
    a localCheckpoint has no lineage to recompute from).

    ``DataFrame.unpersist()`` is NOT enough (review r6, verified): it
    only clears cache-manager entries, while ``localCheckpoint()``
    persists the plan's internal RDD directly — those blocks survive
    unpersist and accumulate across an iterative loop (the
    connected-components pointer-doubling rounds) until driver GC
    happens to collect the RDD. The actual cached RDD lives on the
    LogicalRDD plan node; unpersist THAT. Reliable checkpoint files
    are cleaned by ``spark.cleaner.referenceTracking.cleanCheckpoints``
    (or the job's own dir teardown)."""
    if checkpoint_dir is not None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith("LogicalRDD"):
            plan.rdd().unpersist(False)
            return
    except Exception:  # non-checkpoint frame / API drift: fall through
        pass
    df.unpersist()
