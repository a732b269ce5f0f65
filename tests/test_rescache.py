"""Result-cache tests (rescache.py): key semantics, LRU eviction,
nondeterminism refusal, schema fidelity."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.rescache import (
    NondeterministicPlanError,
    ResultCache,
    normalized_plan,
)


@pytest.fixture()
def cache(spark, tmp_path):
    return ResultCache(spark, str(tmp_path / "c"), max_entries=3)


def _src(spark, tmp_path):
    p = str(tmp_path / "src")
    if not os.path.isdir(p):
        spark.range(100).withColumn(
            "v", (F.col("id") % 7).cast("double")
        ).write.parquet(p)
    return spark.read.parquet(p)


def test_rebuilt_plan_hits_and_results_match(spark, tmp_path, cache):
    q = lambda: _src(spark, tmp_path).groupBy("v").count()  # noqa: E731
    a = sorted(tuple(r) for r in cache.get_or_compute(q()).collect())
    b = sorted(tuple(r) for r in cache.get_or_compute(q()).collect())
    assert a == b
    assert (cache.hits, cache.misses) == (1, 1)
    # expression ids differ between the two builds, the normalized
    # plans must not
    assert normalized_plan(q()) == normalized_plan(q())


def test_different_query_different_key(spark, tmp_path, cache):
    base = _src(spark, tmp_path)
    cache.get_or_compute(base.groupBy("v").count()).count()
    cache.get_or_compute(
        base.filter("id > 10").groupBy("v").count()
    ).count()
    assert (cache.hits, cache.misses) == (0, 2)


def test_input_change_moves_key(spark, tmp_path, cache):
    p = str(tmp_path / "grow")
    spark.range(10).write.parquet(p)
    q = lambda: spark.read.parquet(p).groupBy().count()  # noqa: E731
    assert cache.get_or_compute(q()).first()[0] == 10
    spark.range(5).write.mode("append").parquet(p)
    assert cache.get_or_compute(q()).first()[0] == 15  # fresh, not stale
    assert (cache.hits, cache.misses) == (0, 2)


def test_nondeterministic_plan_refused(spark, tmp_path, cache):
    with pytest.raises(NondeterministicPlanError, match="rand"):
        cache.key_for(_src(spark, tmp_path).select(F.rand()))
    with pytest.raises(NondeterministicPlanError):
        cache.key_for(
            _src(spark, tmp_path).select(F.current_timestamp())
        )


def test_column_named_like_nondet_fn_not_refused(spark, tmp_path, cache):
    """A deterministic query over columns NAMED uuid/now/shuffle must
    cache: the refusal matches function CALLS (trailing paren), not
    identifiers (review r7 false-positive class)."""
    df = _src(spark, tmp_path).select(
        F.col("id").alias("uuid"),
        F.col("v").alias("now"),
        F.col("v").alias("shuffle"),
    )
    a = cache.get_or_compute(df).count()
    b = cache.get_or_compute(df).count()
    assert a == b and (cache.hits, cache.misses) == (1, 1)


def test_lru_eviction_keeps_recent(spark, tmp_path, cache):
    base = _src(spark, tmp_path)
    frames = [base.filter(f"id > {i}").groupBy("v").count() for i in range(4)]
    keys = []
    for f in frames:
        cache.get_or_compute(f).count()
        keys.append(cache.key_for(f))
        time.sleep(0.01)  # distinct mtimes for LRU order
    # max_entries=3: the OLDEST entry was evicted, the rest remain
    assert cache.stats()["entries"] == 3
    assert not os.path.isdir(os.path.join(cache.dir, keys[0]))
    assert all(
        os.path.isdir(os.path.join(cache.dir, k)) for k in keys[1:]
    )


def test_schema_preserved_through_cache(spark, tmp_path, cache):
    df = _src(spark, tmp_path).select(
        F.col("id").cast("int").alias("i"), "v"
    )
    out = cache.get_or_compute(df)
    assert out.schema == df.schema
