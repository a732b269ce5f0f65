"""Sign-LSH bucketed ANN — the scale path.

Bucket key = sign bits of the first ``n_bits`` embedding dimensions
(a deterministic, data-independent hyperplane family: the coordinate
axes). Search scans only the query's bucket (optionally expanding to
Hamming-1 neighbor buckets for recall), then exact-scores within.

Deliberately simple and *reproducible*: the bucketing is expressible in
plain SQL, so the operator is oracle-checkable end-to-end — unlike
random-hyperplane LSH whose planes live outside the query text. At
100 TB: write the table bucketed/partitioned by ``bucket`` and a query
touches 1/2^n_bits of the data (partition pruning), scored in one map
stage. Recall/latency trades via n_bits and n_probes.

An IVF variant (k-means centroids as bucket keys) follows the same
shape — centroid assignment instead of sign bits; see similarity.ivf.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from ..dedup.embedding import cosine
from ..functions.veclit import double_array_lit


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Bucket id from the sign bits of the first n_bits dimensions:
    bit i set iff vec[i] >= 0."""
    out = F.lit(0)
    for i in range(n_bits):
        out = out + F.when(vec[i] >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def with_buckets(df: DataFrame, vec_col: str = "embedding", n_bits: int = 8) -> DataFrame:
    return df.withColumn("bucket", sign_bucket(F.col(vec_col), n_bits))


def _probe_buckets(query_vec: Sequence[float], n_bits: int, n_probes: int) -> list[int]:
    """Query bucket + its Hamming-1 neighbors, nearest-flip first
    (flip the dimensions whose |value| is smallest — most likely to
    differ across the hyperplane)."""
    base = sum((1 << i) for i in range(n_bits) if query_vec[i] >= 0)
    flips = sorted(range(n_bits), key=lambda i: abs(query_vec[i]))
    buckets = [base] + [base ^ (1 << i) for i in flips]
    return buckets[: max(1, n_probes)]


def lsh_cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
    n_probes: int = 4,
    quantize_decimals: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's probe buckets.

    The bucket filter is a pushable predicate — on a bucket-partitioned
    table it prunes to n_probes/2^n_bits of the data.

    ``quantize_decimals`` quantizes the score BEFORE the top-k cut
    (floor(x*10^d + 0.5)/10^d, the registry.quantize form). Callers
    whose oracle orders by a quantized score must cut on the same
    quantized value — cutting on the raw cosine and quantizing after
    can keep a different row when two scores quantize equal at the
    k boundary (raw tie-break vs quantized tie-break).
    """
    probes = _probe_buckets(list(query_vec), n_bits, n_probes)
    q = double_array_lit(query_vec)
    score = cosine(F.col(vec_col).cast("array<double>"), q)
    if quantize_decimals is not None:
        m = 10**quantize_decimals
        score = F.floor(score * m + F.lit(0.5)) / float(m)
    scored = (
        with_buckets(df, vec_col, n_bits)
        .filter(F.col("bucket").isin(probes))
        .select(F.col(id_col), score.alias("cos"))
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)
