"""Connected-components operator: known graph shapes + the canonical-keep
action (dedup/components.py)."""

from __future__ import annotations

from data_mastery_pipeline_spark.dedup import components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = components.connected_components(df)
    return {r["id"]: r["component"] for r in got.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, everything labels to 1
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_stay_disjoint(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_triangle_with_bridge(spark):
    got = _cc(spark, [(5, 6), (6, 7), (5, 7), (7, 2)])
    assert got == {2: 2, 5: 2, 6: 2, 7: 2}


def test_canonical_keep_drops_non_min_members(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(6)], "doc_id long, text string"
    )
    edges = spark.createDataFrame([(0, 1), (1, 4)], "id_a long, id_b long")
    members = components.connected_components(
        edges, id_alias="doc_id", comp_alias="cluster_id"
    )
    kept = components.canonical_per_component(
        members, df, id_col="doc_id", comp_col="cluster_id"
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2, 3, 5]


def test_jaccard_build_strategies_agree(spark):
    """broadcast and length-bucket-shuffle paths produce identical pairs."""
    from data_mastery_pipeline_spark.dedup import ngram
    from data_mastery_pipeline_spark.tables import load_table
    from conftest import SF_ORACLE

    docs = load_table(spark, "documents", SF_ORACLE)
    a = ngram.jaccard_pairs_blocked(docs, build="broadcast")
    b = ngram.jaccard_pairs_blocked(docs, build="shuffle")
    ra = sorted((r["id_a"], r["id_b"]) for r in a.collect())
    rb = sorted((r["id_a"], r["id_b"]) for r in b.collect())
    assert ra == rb and len(ra) > 0


# --- sampling & split operators ---------------------------------------------


def test_train_test_split_disjoint_exhaustive_stable(spark):
    from data_mastery_pipeline_spark.operators import sampling
    from data_mastery_pipeline_spark.tables import load_table
    from conftest import SF_ORACLE

    docs = load_table(spark, "documents", SF_ORACLE)
    gate = sampling.hash_gate("doc_id", salt=42)
    train, test = sampling.train_test_split(docs, 0.1, gate)
    n, ntr, nte = docs.count(), train.count(), test.count()
    assert ntr + nte == n
    assert train.join(test, "doc_id", "inner").count() == 0
    # ~10% within tolerance for 500 docs
    assert 0.04 * n <= nte <= 0.16 * n
    # membership is repartition-stable
    re_test = sampling.train_test_split(docs.repartition(13), 0.1, 
        sampling.hash_gate("doc_id", salt=42))[1]
    assert sorted(r["doc_id"] for r in re_test.collect()) == sorted(
        r["doc_id"] for r in test.collect()
    )


def test_deterministic_shuffle_reproducible_permutation(spark):
    from data_mastery_pipeline_spark.operators import sampling
    from data_mastery_pipeline_spark.tables import load_table
    from conftest import SF_ORACLE

    docs = load_table(spark, "documents", SF_ORACLE).select("doc_id")
    a = [r["doc_id"] for r in sampling.deterministic_shuffle(docs, "doc_id", seed=1, num_partitions=4).collect()]
    b = [r["doc_id"] for r in sampling.deterministic_shuffle(docs, "doc_id", seed=1, num_partitions=4).collect()]
    c = [r["doc_id"] for r in sampling.deterministic_shuffle(docs, "doc_id", seed=2, num_partitions=4).collect()]
    assert a == b                      # same seed → identical order
    assert a != c                      # new seed → new permutation
    assert sorted(a) == sorted(c)      # same multiset
    assert a != sorted(a)              # actually shuffled
