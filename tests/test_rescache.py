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
    UncacheablePlanError,
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


def test_local_relation_refused(spark, tmp_path, cache):
    """Two in-memory DataFrames with the same schema but different
    rows print identical plans (LocalRelation shows only attributes) —
    caching them would serve the first's rows for the second, so any
    non-empty LocalRelation is refused outright (ADVICE r7)."""
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([(2,)], "x int")
    assert normalized_plan(a) == normalized_plan(b)  # the hazard is real
    with pytest.raises(UncacheablePlanError, match="in-memory"):
        cache.key_for(a.groupBy().sum("x"))
    # joined against a file scan the in-memory rows are STILL
    # invisible to the key — refused there too
    with pytest.raises(UncacheablePlanError, match="in-memory"):
        cache.key_for(
            _src(spark, tmp_path).join(a, F.col("id") == F.col("x"))
        )


def test_no_input_files_refused(spark, cache):
    with pytest.raises(UncacheablePlanError, match="no files"):
        cache.key_for(spark.range(10).groupBy().count())


def test_streaming_frame_refused(spark, cache):
    stream = spark.readStream.format("rate").load()
    with pytest.raises(UncacheablePlanError, match="streaming"):
        cache.key_for(stream)


def test_literal_hash_digits_not_merged(spark, tmp_path, cache):
    """The expr-id strip must not eat a literal '#123' inside a string
    constant: filters on '#1' vs '#2' are different queries (ADVICE
    r7)."""
    base = _src(spark, tmp_path).withColumn(
        "tag", F.concat(F.lit("#"), F.col("id").cast("string"))
    )
    p1 = normalized_plan(base.filter(F.col("tag") == "#123"))
    p2 = normalized_plan(base.filter(F.col("tag") == "#456"))
    assert p1 != p2
    # while genuine attribute ids are still normalized away
    q = lambda: _src(spark, tmp_path).groupBy("v").count()  # noqa: E731
    assert normalized_plan(q()) == normalized_plan(q())


def test_served_reader_survives_eviction_pressure(spark, tmp_path, cache):
    """A lazy reader handed out by get_or_compute must stay readable
    even when later misses push the LRU past max_entries: the entry is
    pinned while the caller still holds the DataFrame (ADVICE r7)."""
    base = _src(spark, tmp_path)
    held = cache.get_or_compute(base.groupBy("v").count())  # not collected
    for i in range(5):  # max_entries=3 → heavy eviction pressure
        cache.get_or_compute(
            base.filter(f"id > {i}").groupBy("v").count()
        ).count()
        time.sleep(0.01)
    assert held.count() == 7  # materializes fine — dir not evicted
    del held  # caller drops it → evictable again on the next miss
    cache.get_or_compute(base.filter("id > 90").groupBy("v").count()).count()
    assert cache.stats()["entries"] <= 4


def test_schema_preserved_through_cache(spark, tmp_path, cache):
    df = _src(spark, tmp_path).select(
        F.col("id").cast("int").alias("i"), "v"
    )
    out = cache.get_or_compute(df)
    assert out.schema == df.schema
