"""Bloom semi-join reduction: no false negatives, real pruning, exact
join results (operators/bloomjoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.operators import bloomjoin
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_SMOKE


def test_no_false_negatives(spark):
    """Every true dim key passes its own bloom — definitional, checked
    over a real key column."""
    cust = load_table(spark, "customer", SF_SMOKE).select("c_custkey")
    bloom = bloomjoin.build_bloom(cust, "c_custkey", num_bits=1 << 14)
    missed = (
        cust.join(F.broadcast(bloom))
        .filter(
            ~bloomjoin.might_contain("c_custkey", 1 << 14)
        )
        .count()
    )
    assert missed == 0


def test_pruning_is_selective(spark):
    """A bloom over a tiny key subset rejects the vast majority of a
    disjoint probe set (fpr sanity at the default sizing)."""
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    probes = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    bloom = bloomjoin.build_bloom(keys, "k")
    passed = (
        probes.join(F.broadcast(bloom))
        .filter(bloomjoin.might_contain("k", 1 << 17))
        .count()
    )
    # m=2^17, k=5, n=100 → fpr ≈ (1-e^(-5*100/131072))^5 ≈ 2e-13
    assert passed < 10


def test_pruned_join_equals_plain_join(spark):
    """The headline contract: bloom_pruned_join ≡ plain inner join."""
    orders = load_table(spark, "orders", SF_SMOKE)
    cust = load_table(spark, "customer", SF_SMOKE).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    got = (
        bloomjoin.bloom_pruned_join(orders, cust, "o_custkey", "c_custkey")
        .select("o_orderkey")
        .collect()
    )
    want = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey")
        .collect()
    )
    assert sorted(r.o_orderkey for r in got) == sorted(r.o_orderkey for r in want)


def test_outer_join_rejected(spark):
    orders = load_table(spark, "orders", SF_SMOKE)
    cust = load_table(spark, "customer", SF_SMOKE)
    with pytest.raises(ValueError, match="pruning breaks"):
        bloomjoin.bloom_pruned_join(orders, cust, "o_custkey", "c_custkey", how="left")


def test_bad_num_bits_rejected(spark):
    cust = load_table(spark, "customer", SF_SMOKE)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloomjoin.build_bloom(cust, "c_custkey", num_bits=100)


def test_empty_dim_builds_empty_bloom(spark):
    """Empty dim → all-zero words → every probe rejected (and the
    pruned join is empty, matching the plain join)."""
    cust = load_table(spark, "customer", SF_SMOKE).filter(F.lit(False))
    bloom = bloomjoin.build_bloom(cust, "c_custkey", num_bits=1 << 10)
    probes = spark.range(100).select(F.col("id").alias("k"))
    passed = (
        probes.join(F.broadcast(bloom))
        .filter(bloomjoin.might_contain("k", 1 << 10))
        .count()
    )
    assert passed == 0


def test_key_dtype_mismatch_rejected(spark):
    """xxhash64 is type-sensitive: an int-keyed fact probed against a
    bigint-built bloom would silently prune TRUE matches. The join must
    refuse mismatched key dtypes instead."""
    import pytest as _pytest

    fact = spark.range(10).select(F.col("id").cast("int").alias("k"), F.lit(1).alias("x"))
    dim = spark.range(10).select(F.col("id").alias("k2"))  # bigint
    with _pytest.raises(TypeError, match="type-sensitive"):
        bloomjoin.bloom_pruned_join(fact, dim, "k", "k2")


def test_fact_with_reserved_bloom_column_rejected(spark):
    # ADVICE r05: a pre-existing column named like the internal bloom
    # carrier would make the broadcast cross-join ambiguous
    dim = load_table(spark, "nation", SF_SMOKE)
    fact = load_table(spark, "customer", SF_SMOKE).withColumn(
        bloomjoin.BLOOM_COL, F.lit(1)
    )
    with pytest.raises(ValueError, match="already has"):
        bloomjoin.bloom_pruned_join(fact, dim, "c_nationkey", "n_nationkey")
