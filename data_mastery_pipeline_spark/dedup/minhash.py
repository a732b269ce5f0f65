"""MinHash + LSH near-duplicate detection, DataFrame-native.

Pipeline (all Catalyst expressions — no UDFs, no Spark-ML dependency):
  shingle:   text → distinct word k-shingles (array column)
  hash once: explode shingles → h = xxhash64(shingle) & 0x7FFFFFFF
  family:    g_i(h) = (a_i*h + b_i) mod p  (universal hashing — cheap
             multiply-add per function instead of 64 string re-hashes;
             a_i,b_i from a fixed-seed PRNG, so fully deterministic)
  minhash:   ONE vectorized groupBy(doc).agg(min(g_0)…min(g_63))
             (map-side partial min, one shuffle on doc id)
  banding:   signature split into b bands of r rows; band hash = xxhash64
  candidate: explode bands → groupBy (band_idx, band_hash) → pairs
  verify:    exact Jaccard on the shingle sets of candidate pairs

Scale: shuffles are (a) the signature groupBy on doc id, (b) the
band-bucket groupBy (uniform 64-bit keys), (c) the candidate-pair join
back to shingle sets. No all-pairs product ever materializes; bucket
skew is bounded by ``max_bucket`` (degenerate buckets — e.g. thousands
of empty docs — belong to exact dedup, not LSH).

31-bit masking keeps every product under 2^62: safe under ANSI-mode
bigint arithmetic (no overflow), while 2M+ distinct shingle hashes keep
collision probability per hash function ~1e-3 — irrelevant to a min
over hundreds of shingles.

Probability a pair with Jaccard s becomes a candidate: 1-(1-s^r)^b
(the standard S-curve; r=4, b=16 → ~0.5 crossover at s≈0.5).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from ..functions.text import tokens

_MASK31 = 0x7FFFFFFF
_P = (1 << 31) - 1  # Mersenne prime 2^31-1


def word_shingles(text: str | Column, k: int = 3) -> Column:
    """Distinct k-word shingles as an array of strings; documents shorter
    than k words yield their single full-text shingle."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle_at = lambda i: F.array_join(F.slice(toks, i + 1, k), " ")  # noqa: E731
    return F.array_distinct(F.transform(idx, shingle_at))


def _hash_family(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) multiply-add coefficients."""
    rng = random.Random(seed)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, minhash[num_hashes]) via explode + one vectorized min-agg."""
    exploded = (
        df.select(F.col(id_col), F.explode(word_shingles(text_col, k)).alias("sh"))
        .withColumn("h", F.xxhash64("sh").bitwiseAND(F.lit(_MASK31)))
    )
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(_hash_family(num_hashes))
    ]
    sig = exploded.groupBy(id_col).agg(*mins)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("minhash"),
    )


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding over a signature table.

    Returns (id_a, id_b) with id_a < id_b, distinct across bands.
    """
    r = num_hashes // bands
    band_hash = lambda b: F.xxhash64(  # noqa: E731
        F.lit(b), *[F.col("minhash")[b * r + i] for i in range(r)]
    )
    banded = sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), band_hash(b).alias("bh")) for b in range(bands)])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")

    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.collect_list(id_col).alias("ids"), F.count("*").alias("n"))
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .withColumn("ids", F.array_sort("ids"))
    )
    pairs = buckets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda a: F.transform(F.col("ids"), lambda b: F.struct(a.alias("id_a"), b.alias("id_b"))),
                    )
                ),
                lambda p: p["id_a"] < p["id_b"],
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b").distinct()
    return pairs


def verified_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: candidates from LSH
    banding, verified with exact Jaccard over shingle sets. Returns
    (id_a, id_b, jaccard) for pairs ≥ threshold."""
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes)
    pairs = lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    sh = df.select(F.col(id_col), word_shingles(text_col, k).alias("shingles"))
    joined = (
        pairs.join(sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
