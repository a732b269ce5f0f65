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


def test_lru_eviction_reclaims_prior_session_entries(spark, tmp_path):
    """Eviction is cross-session: an instance never evicts what IT
    served (a caller may still hold a lazy reader — even a derived
    frame whose Python parent is long collected), so the LRU reclaims
    entries written by PRIOR sessions/instances."""
    from data_mastery_pipeline_spark.rescache import ResultCache

    base = _src(spark, tmp_path)
    old = ResultCache(spark, str(tmp_path / "c"), max_entries=3)
    keys = []
    for i in range(3):
        f = base.filter(f"id > {100 + i}").groupBy("v").count()
        old.get_or_compute(f).count()
        keys.append(old.key_for(f))
        time.sleep(0.01)  # distinct mtimes for LRU order
    # "next session": a fresh instance over the same directory
    cache = ResultCache(spark, str(tmp_path / "c"), max_entries=3)
    new_keys = []
    for i in range(2):
        f = base.filter(f"id > {i}").groupBy("v").count()
        cache.get_or_compute(f).count()
        new_keys.append(cache.key_for(f))
        time.sleep(0.01)
    # 5 entries, cap 3: the two OLDEST prior-session entries are gone,
    # everything this instance served survives
    assert cache.stats()["entries"] == 3
    assert not os.path.isdir(os.path.join(cache.dir, keys[0]))
    assert not os.path.isdir(os.path.join(cache.dir, keys[1]))
    assert all(
        os.path.isdir(os.path.join(cache.dir, k))
        for k in keys[2:] + new_keys
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
    """Plan normalization (canonicalization) must not merge plans that
    differ only in a literal containing '#N' — including the
    word-char-adjacent form 'room#5' that defeated the old regex strip
    (ADVICE r7 + review r8)."""
    base = _src(spark, tmp_path).withColumn(
        "tag", F.concat(F.lit("#"), F.col("id").cast("string"))
    )
    p1 = normalized_plan(base.filter(F.col("tag") == "#123"))
    p2 = normalized_plan(base.filter(F.col("tag") == "#456"))
    assert p1 != p2
    p3 = normalized_plan(base.filter(F.col("tag") == "room#5"))
    p4 = normalized_plan(base.filter(F.col("tag") == "room#7"))
    assert p3 != p4
    # while genuine attribute ids are still normalized away
    q = lambda: _src(spark, tmp_path).groupBy("v").count()  # noqa: E731
    assert normalized_plan(q()) == normalized_plan(q())


def test_served_reader_survives_eviction_pressure(spark, tmp_path, cache):
    """A lazy reader handed out by get_or_compute must stay readable
    even when later misses push the LRU past max_entries — INCLUDING a
    derived frame whose intermediate Python object was collected (the
    review-r8 case a per-object weakref pin missed)."""
    base = _src(spark, tmp_path)
    # derived frame: the returned reader object itself is dropped
    # immediately; only the child survives in Python
    held = cache.get_or_compute(base.groupBy("v").count()).filter(
        "count > 0"
    )
    for i in range(5):  # max_entries=3 → heavy eviction pressure
        cache.get_or_compute(
            base.filter(f"id > {i}").groupBy("v").count()
        ).count()
        time.sleep(0.01)
    assert held.count() == 7  # materializes fine — dir not evicted


def test_schema_preserved_through_cache(spark, tmp_path, cache):
    df = _src(spark, tmp_path).select(
        F.col("id").cast("int").alias("i"), "v"
    )
    out = cache.get_or_compute(df)
    assert out.schema == df.schema
