"""Substring-level shared-span detection (below-document-grain dedup).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") showed verbatim repeated substrings — not whole near-dup
documents — are the dominant duplication mode in web corpora. This
operator finds document pairs sharing a verbatim token run of at least
``min_span`` tokens and reports exact span lengths.

Method: anchor every k-gram with its position (grams travel as xxhash64
of the token struct, 8 B each), join anchors on the gram, then merge
consecutive anchors per (pair, diagonal pa−pb) with gaps-and-islands —
a run of L−k+1 consecutive anchors is exactly a shared substring of L
tokens, so lengths are exact, not heuristic.

Scale: the anchor join is the data-sized shuffle (same key shape as the
contamination / boilerplate gram joins). ``max_gram_df`` caps anchor
document frequency first — a boilerplate k-gram occurring in 10k docs
would fan the join out quadratically, and cross-corpus boilerplate is
boilerplate_ngram_share's business, not span dedup's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as textfn


def shared_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    min_span: int = 20,
    max_gram_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, max_span_tokens, n_spans) for pairs sharing a
    verbatim run of ≥ ``min_span`` tokens. ``max_gram_df``: drop anchor
    grams occurring in more than this many documents before the join
    (None = exact, no cap).

    ``n_spans`` semantics (review r6 clarification): it counts ALL
    shared anchor runs of ≥ k tokens on every diagonal offset — the
    ``min_span`` gate applies only to ``max_span_tokens`` (the pair
    qualifies iff its LONGEST run reaches min_span). Internally
    repetitive text therefore multiplies n_spans (one shared repeated
    region matches on several diagonals); rank pairs by
    ``max_span_tokens``, and treat ``n_spans`` as a repetitiveness-
    sensitive match-density signal, not a count of min_span-long
    runs."""
    from ..parallelism import fan_out

    toks = textfn.tokens(text_col)
    grams = (
        fan_out(docs).filter(F.size(toks) >= k)
        .select(
            F.col(id_col).alias("__id"),
            F.posexplode(
                F.transform(
                    textfn.word_ngram_structs(text_col, k),
                    lambda s: F.xxhash64(s),
                )
            ).alias("pos0", "gh"),
        )
        .select("__id", (F.col("pos0") + 1).alias("pos"), "gh")
    )
    if max_gram_df is not None:
        hot = (
            grams.groupBy("gh")
            .agg(F.countDistinct("__id").alias("df"))
            .filter(F.col("df") > max_gram_df)
            .select("gh")
        )
        grams = grams.join(F.broadcast(hot), "gh", "left_anti")
    a = grams.select(F.col("__id").alias("id_a"), F.col("pos").alias("pa"), "gh")
    b = grams.select(F.col("__id").alias("id_b"), F.col("pos").alias("pb"), "gh")
    m = (
        a.join(b, "gh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", "pb")
        .distinct()
    )
    diag = F.col("pa") - F.col("pb")
    w = Window.partitionBy("id_a", "id_b", diag).orderBy("pa")
    spans = (
        m.select(
            "id_a",
            "id_b",
            "pa",
            diag.alias("diag"),
            (F.col("pa") - F.row_number().over(w)).alias("grp"),
        )
        .groupBy("id_a", "id_b", "diag", "grp")
        .agg((F.count("*") + F.lit(k - 1)).alias("span_tokens"))
    )
    return (
        spans.groupBy("id_a", "id_b")
        .agg(
            F.max("span_tokens").cast("bigint").alias("max_span_tokens"),
            F.count("*").alias("n_spans"),
        )
        .filter(F.col("max_span_tokens") >= min_span)
    )
