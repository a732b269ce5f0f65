"""Bounded-memory exact top-k frequent items: Misra-Gries candidate
generation + exact recount — two passes, the item stream is never
shuffled.

``top_tokens`` (queries_ext.py) is the one-shuffle groupBy form: at
100 TB its shuffle carries one row per DISTINCT token per map
partition, which is the right plan while the distinct cardinality is
sane. When the distinct cardinality is itself the problem (URLs,
n-grams, user agents — billions of distinct keys; the hash aggregate
spills and the shuffle explodes), the classical answer is the
Misra-Gries summary [Misra & Gries, Science of Computer Programming
1982; mergeable form: Agarwal, Cormode, Huang, Phillips, Wei, Yi —
"Mergeable Summaries", PODS 2012]:

pass 1  each partition folds its stream through a ``cap``-counter MG
        sketch — memory O(cap) REGARDLESS of distinct cardinality.
        Arrow-batched and vectorized: per batch, pandas
        ``value_counts`` (C speed) then the mergeable-MG trim — add
        the batch counts, and while more than ``cap`` counters
        survive, subtract the (cap+1)-th largest count from all and
        drop non-positives. Output: ≤ cap candidate tokens per
        partition plus one sentinel row carrying the partition's
        stream length.
pass 2  exact recount of the candidate union (broadcast semi-join
        against the stream — a filter, not a shuffle of the stream —
        then one map-side-combined groupBy over ≤ P·cap keys) and an
        exact top-k of the recounts.

Correctness: an MG sketch with ``cap`` counters retains every item
whose local frequency exceeds N_p/(cap+1). If freq(x) > N/(cap+1)
globally then freq_p(x) > N_p/(cap+1) in at least one partition
(otherwise summing freq_p(x) ≤ N_p/(cap+1) over p bounds freq(x) by
N/(cap+1)), so x survives that partition's sketch: the candidate
union is a SUPERSET of every item with global frequency > N/(cap+1).
The recounted top-k is therefore EXACT whenever the true k-th
frequency clears that bound — and ``guarantee_ok`` certifies exactly
that from measured quantities (k-th recount · (cap+1) > N), so an
undersized ``cap`` surfaces as a visible FALSE, never as a silently
wrong list.

Reference parity: the reference engine's word-count / top-terms jobs
(analytics stage) are plain hash aggregates; this operator is the
beyond-reference scale path for the same question, per the round
brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import truncate_lineage


def mg_summarize(df: DataFrame, col: str, cap: int) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries.

    Returns ``(item string, n_part bigint)`` — per partition, ≤ cap
    candidate rows (``n_part`` NULL) plus ONE sentinel row (``item``
    NULL) whose ``n_part`` is the partition's stream length, so the
    caller gets the global N without a second full scan. NULL items in
    the input are ignored (they are not countable tokens)."""
    if cap < 1:
        raise ValueError(f"mg_summarize: cap must be ≥ 1, got {cap}")

    def gen(batches):
        import pandas as pd

        counters: dict = {}
        n_part = 0
        for pdf in batches:
            s = pdf[col].dropna()
            if not len(s):
                continue
            n_part += int(len(s))
            vc = s.value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > cap:
                # mergeable-MG trim: subtract the (cap+1)-th largest
                # count, drop non-positives — one vectorized decrement
                # replacing per-token decrement loops
                kth = sorted(counters.values(), reverse=True)[cap]
                counters = {
                    i: c - kth for i, c in counters.items() if c > kth
                }
        out = pd.DataFrame(
            {
                col: list(counters.keys()) + [None],
                "n_part": [None] * len(counters) + [n_part],
            }
        )
        yield out

    return df.select(col).mapInPandas(gen, f"{col} string, n_part bigint")


def exact_topk(
    df: DataFrame, col: str, k: int, cap: int = 4096
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``df[col]`` with the
    two-pass MG design (module docstring). Returns
    ``(col, n, guarantee_ok)`` ordered (n DESC, col) — values exact by
    recount; ``guarantee_ok`` TRUE iff BOTH (a) exactly ``k`` candidate
    rows came back AND (b) the k-th recount exceeds N/(cap+1) —
    together the condition under which no non-candidate can belong to
    the true top-k. (b) alone is not enough: with fewer than ``k``
    candidates the missing slots of the true top-k are non-candidates
    by definition (caught by the --mg scale probe: 5 heavy tokens over
    a unique-tail stream returned 5 rows for k=20 with a truthy (b)).

    The pass-1 summary is localCheckpointed (it is ≤ P·cap + P rows)
    so candidates and the stream-length sentinel read materialized
    blocks instead of re-running the MG scan twice."""
    summary = truncate_lineage(mg_summarize(df, col, cap), None)
    cands = summary.filter(F.col(col).isNotNull()).select(col).distinct()
    total = summary.agg(F.sum("n_part").alias("__N"))
    counts = (
        df.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.col(col)).limit(k)
    kth = top.agg(
        F.min("n").alias("__kth"), F.count("*").alias("__k_got")
    )
    return (
        top.crossJoin(F.broadcast(kth))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "guarantee_ok",
            (F.col("__k_got") == k)
            & (F.col("__kth") * (cap + 1) > F.col("__N")),
        )
        .drop("__kth", "__k_got", "__N")
    )
