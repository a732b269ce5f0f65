"""N-gram Jaccard near-dup detection with deterministic blocking —
the oracle-checkable exact twin of the MinHash path.

Where MinHash trades exactness for scale, this operator computes exact
token-set Jaccard inside explicit blocks (same language + similar
length), which is SQL-expressible and therefore DuckDB-verifiable. At
100 TB the same shape holds: blocks bound the quadratic term, and the
within-block self-join shuffles once on the block key.
"""

from __future__ import annotations

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
) -> DataFrame:
    """Exact token-set Jaccard over within-block pairs.

    Blocks on ``block_cols``; prunes pairs whose token counts differ by
    more than ``length_tolerance`` (a true Jaccard ≥ t implies the sizes
    are within factor 1/t, so moderate tolerances cannot lose qualifying
    pairs at practical thresholds). Returns (id_a, id_b, jaccard).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.array_distinct(tokens(text_col)).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))

    a = base.select(
        F.col("id").alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_cols],
        F.col("toks").alias("toks_a"),
        F.col("n_toks").alias("n_a"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("toks").alias("toks_b"),
        F.col("n_toks").alias("n_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    lo = 1.0 - length_tolerance
    hi = 1.0 + length_tolerance
    cond = cond & F.col("n_b").between(F.col("n_a") * lo, F.col("n_a") * hi)

    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("double")
    return (
        a.join(b, cond)
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
