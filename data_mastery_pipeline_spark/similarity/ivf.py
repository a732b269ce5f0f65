"""IVF (inverted-file) ANN — trained-centroid bucketing, the
production-scale complement to the data-independent sign-LSH buckets.

Index build: k-means centroids (Spark ML, fixed seed) over a training
sample; every vector is assigned to its nearest centroid ("cell") with
a pure Catalyst argmin expression (centroids become plan literals — no
join, no UDF in the hot path). At 100 TB the table is written
partitioned by `cell`, so a query scans `n_probes / n_cells` of the
data: centroid assignment is the partition-pruning predicate.

Search: exact cosine within the query's `n_probes` nearest cells.
Recall/latency trades via n_cells and n_probes — the standard IVF-Flat
design (FAISS terminology), expressed as DataFrame ops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from ..dedup.embedding import cosine


def train_centroids(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_rows: int = 100_000,
) -> list[list[float]]:
    """k-means centroids on a bounded sample (index-build step; at scale
    train on a sample, never the full table). Returns plain Python
    vectors so assignment compiles to plan literals.

    The sample is hash-ordered, not ``limit()`` scan order (review r6):
    a bare limit takes the LEADING partitions, so a table laid out by
    cluster label or ingestion time would train every centroid on one
    region of embedding space and collapse downstream recall. Ordering
    by xxhash64 of the vector is deterministic, spreads the draw across
    the whole table, and compiles to TakeOrderedAndProject (per-
    partition top-n heap — one scan, no full sort)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    arr = F.col(vec_col).cast("array<double>")
    train = (
        # null embeddings excluded (review r6, 11th pass): one NULL row
        # sampled into the training set dies deep inside KMeans.fit
        # with an unrelated-looking error instead of naming the fix
        df.filter(F.col(vec_col).isNotNull())
        .select(arr.alias("__arr"))
        .orderBy(F.xxhash64(F.col("__arr")))
        .limit(max_train_rows)
        .select(array_to_vector(F.col("__arr")).alias("features"))
    )
    if not train.head(1):
        raise ValueError(
            f"train_centroids: no non-null {vec_col!r} rows to train on "
            f"(empty table or all-null embedding column)"
        )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _l2sq_to(vec: Column, centroid: Sequence[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_cells(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add `cell` = argmin_i ||v - centroid_i||² as a single expression
    (array of distances → array_position of the min)."""
    v = F.col(vec_col).cast("array<double>")
    dists = F.array(*[_l2sq_to(v, c) for c in centroids])
    cell = F.array_position(dists, F.array_min(dists)) - 1
    return df.withColumn("cell", cell.cast("int"))


def _probe_cells(
    query_vec: Sequence[float], centroids: Sequence[Sequence[float]], n_probes: int
) -> list[int]:
    d = [
        sum((q - c) ** 2 for q, c in zip(query_vec, cen)) for cen in centroids
    ]
    return sorted(range(len(centroids)), key=lambda i: d[i])[: max(1, n_probes)]


def ivf_topk(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probes: int = 4,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's n_probes
    nearest cells. The cell filter is pushable — on a cell-partitioned
    table it prunes partitions."""
    probes = _probe_cells(list(query_vec), centroids, n_probes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = (
        assign_cells(df, centroids, vec_col)
        .filter(F.col("cell").isin(probes))
        .select(F.col(id_col), cosine(F.col(vec_col).cast("array<double>"), q).alias("cos"))
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)
