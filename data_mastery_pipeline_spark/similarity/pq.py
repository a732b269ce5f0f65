"""IVF-PQ — product quantization over IVF residuals, the memory-scale
step past IVF-Flat (similarity/ivf.py).

At 100 TB of embeddings even the residents of the probed IVF cells
dwarf executor memory if every comparison reads the full float vector.
The FAISS-style answer: store each vector as ``m`` small CODES (here
one byte each) against per-subspace codebooks trained on the residual
``v − centroid(cell)``, and answer queries in two stages —

1. **ADC shortlist** (asymmetric distance computation): for each
   probed cell, precompute the query-residual-to-codebook lookup table
   ``LUT[m][j] = ‖q'ₘ − codebookₘⱼ‖²`` on the DRIVER (m·ksub floats —
   plan literals), and score every code row with
   ``Σₘ element_at(LUTₘ, codeₘ+1)`` — a pure Catalyst expression over
   the CODES column only. The full vectors are never touched; the scan
   reads ``m`` bytes per row instead of ``4·d``.
2. **Exact re-rank**: the top ``k·refine`` shortlist ids join back to
   the vector table (broadcast of the bounded shortlist — key-pruned,
   O(shortlist) full-vector reads) and exact cosine orders the final
   top-k.

Training (index build, sample-bounded like IVF): residuals are sliced
into ``m`` subvectors and one k-means per subspace learns ``ksub``
codes. All trained artifacts (centroids, codebooks) are plain Python
lists → plan literals, so search plans stay JVM-side with zero joins
against index state and zero UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.embedding import cosine
from .ivf import _l2sq_to, _probe_cells, assign_cells


def _residual_col(vec_col: str, centroids) -> "F.Column":
    """``v − centroid(cell)`` with the centroid matrix as ONE nested
    array literal indexed by the row's cell — no join."""
    cents = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for c in centroids
        ]
    )
    own = F.element_at(cents, F.col("cell") + 1)
    return F.zip_with(
        F.col(vec_col).cast("array<double>"), own, lambda x, y: x - y
    )


def train_pq(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    m: int = 4,
    ksub: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_rows: int = 50_000,
) -> list[list[list[float]]]:
    """Per-subspace codebooks over IVF residuals → ``codebooks[m][ksub]
    [dsub]`` as plain Python lists (plan literals downstream). One
    bounded hash-ordered sample feeds all ``m`` k-means fits."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    d = len(centroids[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    res = (
        assign_cells(
            df.filter(F.col(vec_col).isNotNull()), centroids, vec_col
        )
        .select(_residual_col(vec_col, centroids).alias("__res"))
        .orderBy(F.xxhash64(F.col("__res")))
        .limit(max_train_rows)
    )
    subs = res.select(
        *[
            F.slice(F.col("__res"), i * dsub + 1, dsub).alias(f"__s{i}")
            for i in range(m)
        ]
    )
    from ..checkpointing import release, truncate_lineage

    # ONE pass materializes the sample for the m fits; released after
    # (repeated index builds must not accumulate dead blocks)
    subs = truncate_lineage(subs, None)
    try:
        books: list[list[list[float]]] = []
        for i in range(m):
            train = subs.select(
                array_to_vector(F.col(f"__s{i}")).alias("features")
            )
            # subspace codebooks converge fast (dsub-dim residuals); 8
            # iterations matches FAISS's default-ish budget and halves
            # the m-fit index-build wall vs 20
            model = KMeans(k=ksub, seed=seed + i, maxIter=8).fit(train)
            books.append(
                [list(map(float, c)) for c in model.clusterCenters()]
            )
    finally:
        release(subs)
    return books


def encode_pq(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, cell, codes array<int>)`` — the PQ index relation (m
    bytes per row at ksub ≤ 256; at scale this is the table that gets
    written cell-partitioned, full vectors stay in the base table).
    Each code is a pure-Catalyst argmin over its subspace codebook."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    out = assign_cells(df, centroids, vec_col).withColumn(
        "__res", _residual_col(vec_col, centroids)
    )
    codes = []
    for i in range(m):
        sub = F.slice(F.col("__res"), i * dsub + 1, dsub)
        dists = F.array(*[_l2sq_to(sub, c) for c in codebooks[i]])
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return out.select(
        F.col(id_col), F.col("cell"), F.array(*codes).alias("codes")
    )


def adc_shortlist(
    codes_df: DataFrame,
    centroids: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    query_vec: Sequence[float],
    n: int,
    n_probes: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Stage 1: the top-``n`` candidate ids by asymmetric distance over
    the CODES relation in the query's probed cells — per-cell LUTs as
    plan literals, m bytes read per row, no full vectors (module
    docstring). Public so scale probes / callers can measure or reuse
    the shortlist directly."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    q = [float(x) for x in query_vec]
    probes = _probe_cells(q, centroids, n_probes)
    parts = []
    for c in probes:
        resid = [qi - ci for qi, ci in zip(q, centroids[c])]
        luts = []
        for i in range(m):
            sub = resid[i * dsub : (i + 1) * dsub]
            luts.append(
                [
                    sum((a - b) ** 2 for a, b in zip(sub, code))
                    for code in codebooks[i]
                ]
            )
        dist = None
        for i in range(m):
            term = F.element_at(
                F.array(*[F.lit(v) for v in luts[i]]),
                F.element_at(F.col("codes"), i + 1) + 1,
            )
            dist = term if dist is None else dist + term
        parts.append(
            codes_df.filter(F.col("cell") == c).select(
                F.col(id_col), dist.alias("adc")
            )
        )
    shortlist = parts[0]
    for p in parts[1:]:
        shortlist = shortlist.unionByName(p)
    return shortlist.orderBy(F.asc("adc"), F.col(id_col)).limit(n)


def ivfpq_topk(
    codes_df: DataFrame,
    vectors_df: DataFrame,
    centroids: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    n_probes: int = 4,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC shortlist over the codes relation, exact-cosine re-rank of
    ``k·refine`` candidates against the vector table (see module
    docstring). Returns the exact-reranked top-k ``(id, cos)``."""
    q = [float(x) for x in query_vec]
    shortlist = adc_shortlist(
        codes_df, centroids, codebooks, q,
        max(k, k * refine), n_probes, id_col,
    )
    qlit = F.array(*[F.lit(x) for x in q])
    return (
        vectors_df.join(F.broadcast(shortlist.select(id_col)), id_col)
        .select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), qlit).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )
