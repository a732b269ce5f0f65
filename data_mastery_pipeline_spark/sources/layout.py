"""Z-order (Morton curve) clustered layout — multi-dimension data
skipping on plain parquet (SURVEY §4 access-path row; the table-format
OPTIMIZE ZORDER BY, re-expressed Spark-first).

``writers.write_clustered`` (1-D range clustering) makes ONE column's
file min/max stats selective; a needle on any OTHER dimension still
reads every file. Interleaving the bits of several dimensions into one
Morton value and range-clustering on THAT gives every interleaved
dimension partially-selective stats at once — the standard lakehouse
layout for multi-dimensional needle queries (Delta/Iceberg Z-order,
going back to Morton 1966 and the UB-tree).

Dimension scaling is EQUI-DEPTH by default: each dimension maps to its
approxQuantile bucket index, not a min/max linear scale. Measured on
this repo's own testdata (events.value is right-skewed, mean 78 of max
490): min/max scaling left 14/16 files overlapping a [50, 120] value
needle — nearly useless — because most rows share the same high-order
scaled bits, so the curve degenerates to 1-D on the other dimension.
Quantile bucketing spreads every dimension's bits evenly by
construction, which is exactly why production Z-order implementations
sample range boundaries rather than scale linearly.

Everything row-wise is pure Catalyst expression code (shift/mask/or
plus a higher-order-function bucket search over a literal boundary
array — no UDF); the only driver-side data is the boundary list
(2**bits - 1 doubles per dimension).

100 TB notes:
- boundary estimation is one Greenwald-Khanna approxQuantile pass
  (or run it on a sample; boundaries need file-level, not row-level,
  precision);
- the z-value itself is a narrow map — no shuffle;
- the layout write is exactly one range shuffle on the z-value (the
  same shuffle any clustered write pays), and file count follows
  ``num_files``/AQE sizing, so the curve adds zero extra passes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.veclit import double_array_lit
from .writers import write_clustered

Z_COL = "__zvalue__"  # dunder-fenced (bloomjoin precedent): collision-proof


def _bucket_expr(col: str, bounds: Sequence[float]) -> Column:
    """Equi-depth bucket index of ``col`` against a literal ascending
    boundary array: the count of boundaries <= value — a Catalyst
    higher-order FILTER over a (2**bits - 1)-element literal, no UDF.
    Nulls sort into bucket 0 (the comparison is null-safe false)."""
    arr = double_array_lit(bounds)
    v = F.col(col).cast("double")
    return F.size(F.filter(arr, lambda b: (b <= v) & v.isNotNull())).cast("bigint")


def zvalue_expr(ints: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each already-bucketed integer
    column into one Morton value (dimension 0 owns the lowest bit of
    each group). Pure bitwise Catalyst expression: 2·bits·ndims shift/
    mask/or nodes, well inside codegen limits for bits<=8, ndims<=3."""
    ndims = len(ints)
    z: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        for d, c in enumerate(ints):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndims + d))
    return z


def with_zvalue(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    relative_error: float = 0.001,
) -> DataFrame:
    """Append ``Z_COL`` holding the Morton value of ``cols`` under
    equi-depth bucketing (2**bits buckets per dimension). The boundary
    lists are the only driver-side data — (2**bits - 1) doubles per
    dimension, bounded by construction, never data-sized."""
    if Z_COL in df.columns:
        raise ValueError(f"with_zvalue: input already has a '{Z_COL}' column")
    if not 1 <= len(cols) <= 3:
        raise ValueError("with_zvalue: 1-3 dimensions supported")
    if bits * len(cols) > 62:
        raise ValueError("with_zvalue: bits*ndims must fit a signed bigint")
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    casted = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    all_bounds = casted.stat.approxQuantile(list(cols), qs, relative_error)
    ints = []
    for c, bs in zip(cols, all_bounds):
        # dedupe repeated boundaries (heavy hitters / few distinct
        # values): a value equal to a k-times-repeated boundary must
        # land in ONE bucket
        uniq = sorted(set(bs))
        idx = _bucket_expr(c, uniq)
        k = max(len(uniq), 1)
        if k + 1 < n:
            # spread the k+1 occupied buckets across the FULL bit
            # width: a low-cardinality dimension would otherwise only
            # populate its low Morton bits and vanish from the curve's
            # coarse (file-boundary) structure — measured: a 15-value
            # user_id left every file spanning the whole user range
            idx = F.floor(idx * F.lit((n - 1) / k)).cast("bigint")
        ints.append(idx)
    return df.withColumn(Z_COL, zvalue_expr(ints, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int | None = None,
    bits: int = 8,
) -> None:
    """Z-order-cluster ``df`` on ``cols`` and write parquet: compute
    the Morton value, range-cluster + sort on it (one shuffle — see
    write_clustered), and drop the helper column from the files."""
    zdf = with_zvalue(df, cols, bits)
    write_clustered(zdf, path, [Z_COL], num_files=num_files, drop_cols=[Z_COL])
