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
from ..functions.veclit import double_array_lit


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec`` (deterministic
    tie-break on id). Returns (id, cos) ordered desc."""
    q = double_array_lit(query_vec)
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid of an embedding column, long format
    (label, dim, mean_v) — the distributed vector-mean every clustering /
    IVF-training / class-prototype step needs (ivf.py trains its cells
    with the same pattern).

    posexplode turns arrays into (dim, value) rows so the mean is a plain
    hash aggregate: map-side partial sums per (label, dim), ONE shuffle of
    labels x dims rows — never a collect of vectors to the driver. The
    wide-format alternative (aggregate() over zipped arrays) holds whole
    vectors in each aggregation buffer; long format keeps buffers scalar
    and lets AQE handle label skew.
    """
    exploded = df.select(
        F.col(label_col), F.posexplode(vec_col).alias("dim", "v")
    )
    return exploded.groupBy(label_col, "dim").agg(
        F.avg("v").alias("mean_v"), F.count("*").alias("n_vectors")
    )
