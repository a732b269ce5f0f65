"""N-gram Jaccard near-dup detection with deterministic blocking —
the oracle-checkable exact twin of the MinHash path.

Where MinHash trades exactness for scale, this operator computes exact
token-set Jaccard inside explicit blocks (same language + similar
length), which is SQL-expressible and therefore DuckDB-verifiable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def jaccard_pairs_blocked(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    length_tolerance: float = 0.2,
    threshold: float = 0.35,
    build: str = "broadcast",
) -> DataFrame:
    """Exact token-set Jaccard over within-block pairs.

    Blocks on ``block_cols``; prunes pairs whose token counts differ by
    more than ``length_tolerance`` (a true Jaccard ≥ t implies the sizes
    are within factor 1/t, so moderate tolerances cannot lose qualifying
    pairs at practical thresholds). Returns (id_a, id_b, jaccard).

    ``build`` picks the join strategy — both produce identical pairs:

    - ``"broadcast"``: broadcast the build side, repartition the probe
      side to full parallelism. The trap it avoids: block keys like
      `lang` have a HANDFUL of distinct values, so a shuffled self-join
      puts one language per task and leaves the rest of the cluster
      idle (measured 5/32 threads busy → >10× slowdown). Right whenever
      the hashed-token dictionary fits an executor (≈1 KB/doc).
    - ``"shuffle"``: for build sides too big to broadcast — adds a
      LOG-SCALE LENGTH BUCKET to the block key (any pair within the
      length tolerance is at most one bucket apart, so the probe side
      duplicates into bucket±1). Key cardinality becomes
      |blocks| × |length buckets|, restoring shuffle parallelism
      without losing a single qualifying pair.
    """
    # Token sets are compared as int64 xxhash64 values, not strings:
    # array_intersect hashes every element of every candidate pair, and
    # with dense near-dup data that's billions of element ops — int
    # compares measure 3× faster than string compares at identical
    # results (set SIZES are what Jaccard needs; a 64-bit collision
    # altering a size is ~1e-11 per document pair).
    toks_hashed = F.transform(
        F.array_distinct(tokens(text_col)), lambda t: F.xxhash64(t)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        toks_hashed.alias("toks"),
    ).withColumn("n_toks", F.size("toks"))

    lo = 1.0 - length_tolerance
    hi = 1.0 + length_tolerance

    a_cols = [
        F.col("id").alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_cols],
        F.col("toks").alias("toks_a"),
        F.col("n_toks").alias("n_a"),
    ]
    b_cols = [
        F.col("id").alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("toks").alias("toks_b"),
        F.col("n_toks").alias("n_b"),
    ]

    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    cond = cond & F.col("n_b").between(F.col("n_a") * lo, F.col("n_a") * hi)

    if build == "broadcast":
        sc = df.sparkSession.sparkContext
        a = base.select(*a_cols).repartition(sc.defaultParallelism)
        joined = a.join(F.broadcast(base.select(*b_cols)), cond)
    elif build == "shuffle":
        # log-scale bucket with base B = max(hi, 1/lo): for any pair in
        # tolerance, |log_B(n_b/n_a)| ≤ 1, so floor buckets differ by at
        # most 1 — the probe side fans out to bucket±1 and the join is a
        # plain equi-join on (blocks…, bucket). (Base hi alone is WRONG:
        # log_hi(1/lo) > 1 when lo < 1/hi, silently dropping pairs.)
        base_b = max(hi, 1.0 / lo)
        bucket = F.floor(
            F.log(F.greatest(F.col("n_toks"), F.lit(1)).cast("double"))
            / math.log(base_b)
        )
        a = base.select(*a_cols, bucket.alias("__lb")).withColumn(
            "__lb", F.explode(F.array(F.col("__lb") - 1, F.col("__lb"), F.col("__lb") + 1))
        )
        b = base.select(*b_cols, bucket.alias("__lb"))
        joined = a.join(b, on=(cond & (a["__lb"] == b["__lb"]))).drop("__lb")
    else:
        raise ValueError(f"build must be 'broadcast' or 'shuffle', got {build!r}")

    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    # |A∪B| = |A| + |B| − |A∩B| for the DISTINCT arrays — arithmetic,
    # not a second per-pair array pass (array_union costs as much as
    # array_intersect and its size is implied)
    union = F.col("n_a") + F.col("n_b") - inter
    return (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
