"""Brute-force cosine top-k — the exact ANN baseline.

One pass over the embedding table scoring against a broadcast query
vector (a plan literal — no join, no shuffle except the final top-k's
TakeOrderedAndProject heap-merge). This is the correctness reference
for the LSH path and perfectly scalable in the "scan everything once"
sense: 100 TB of embeddings is one map stage + a k-row reduce.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.embedding import cosine


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec`` (deterministic
    tie-break on id). Returns (id, cos) ordered desc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)
