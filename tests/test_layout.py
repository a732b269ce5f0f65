"""Z-order layout (sources/layout.py): Morton interleave correctness,
equi-depth bucketing, and the multi-dimension pruning property that
motivates the whole module."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.sources import layout, manifest as mf, writers
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_SMOKE


def test_zvalue_expr_is_exact_morton_interleave(spark):
    """Pin the bit math against a pure-Python Morton reference over an
    exhaustive 2-D grid (5 bits → 32×32 codes)."""
    bits = 5
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", layout.zvalue_expr([F.col("x"), F.col("y")], bits)
        ).collect()
    }

    def morton(x: int, y: int) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_with_zvalue_equidepth_buckets_balance_skew(spark):
    """A heavily right-skewed dimension still spreads across buckets
    (the min/max-scaling failure measured on events.value: most rows
    collapsing into the lowest buckets degenerates the curve to 1-D)."""
    rows = [(i, float(i) ** 4) for i in range(2000)]  # extreme right skew
    df = spark.createDataFrame(rows, "k bigint, v double")
    z = layout.with_zvalue(df, ["v"], bits=4)  # 16 buckets
    per_bucket = (
        z.groupBy(layout.Z_COL).count().agg(F.max("count")).collect()[0][0]
    )
    # equi-depth: no bucket hoards the data (perfect = 125 of 2000)
    assert per_bucket < 400


def test_with_zvalue_guards(spark):
    df = spark.createDataFrame([(1, 2.0)], "a bigint, b double")
    with pytest.raises(ValueError, match="1-3 dimensions"):
        layout.with_zvalue(df, [])
    with pytest.raises(ValueError, match="bits\\*ndims"):
        layout.with_zvalue(df, ["a", "b"], bits=32)
    clash = df.withColumn(layout.Z_COL, F.lit(1))
    with pytest.raises(ValueError, match="already has"):
        layout.with_zvalue(clash, ["a"])


def test_zorder_makes_every_dimension_selective(spark, tmp_path):
    """THE property 1-D clustering cannot deliver: after Z-ordering on
    (user_id, value), a needle on EITHER dimension alone skips files;
    after 1-D clustering on user_id, a value needle reads everything.
    Row results stay exact via the residual filter."""
    ev = load_table(spark, "events", SF_SMOKE)
    pz, p1 = str(tmp_path / "z"), str(tmp_path / "c")
    layout.write_zordered(ev, pz, ["user_id", "value"], num_files=16)
    writers.write_clustered(ev, p1, ["user_id"], num_files=16)
    man_z = mf.build_manifest(spark, pz, ["user_id", "value"])
    man_1 = mf.build_manifest(spark, p1, ["user_id", "value"])
    total = man_z.count()
    total_1 = man_1.count()  # range partitions can come out empty on
    assert total == 16 and total_1 >= 8  # few distinct keys → no file

    lo, hi = 50.0, 120.0
    assert len(mf.pruned_files(man_z, "value", lo, hi)) < total
    assert len(mf.pruned_files(man_z, "user_id", 2, 5)) < total
    assert len(mf.pruned_files(man_1, "value", lo, hi)) == total_1  # 1-D blind spot

    df, stats = mf.skipping_scan_multi(
        spark, man_z, {"user_id": (2, 5), "value": (lo, hi)}
    )
    assert stats["files_read"] < stats["files_total"]
    expect = ev.filter(
        (F.col("user_id").between(2, 5)) & (F.col("value").between(lo, hi))
    )
    assert df.count() == expect.count()
    # files dropped by the manifest lose no qualifying rows
    assert (
        df.agg(F.sum("value")).collect()[0][0]
        == pytest.approx(expect.agg(F.sum("value")).collect()[0][0])
    )


def test_zorder_written_files_do_not_leak_helper_column(spark, tmp_path):
    ev = load_table(spark, "events", SF_SMOKE)
    p = str(tmp_path / "z2")
    layout.write_zordered(ev, p, ["user_id", "value"], num_files=4)
    back = spark.read.parquet(p)
    assert layout.Z_COL not in back.columns
    assert back.count() == ev.count()
