"""Materialized views over the transaction log: incremental refresh +
aggregate navigation (query answering from the MV, never the base).

The storage layer (sources/txlog.py) already provides the two halves a
materialized-view system needs — an incremental READ (``changes()``,
the CDF retraction feed) and an exactly-once incremental WRITE
(``merge_upsert(stream_txn=…)``). This module composes them into the
feature the lakehouse ecosystems ship as "materialized views with
incremental refresh" (Delta Live Tables / Snowflake MVs / Oracle's
query rewrite): a sum/count aggregate table that

- **refreshes incrementally**: each ``refresh()`` reads ONLY the CDF
  of the commits since the last refresh — O(changed files), never the
  base table — folds the retraction rows into per-dim signed deltas
  (+insert/−delete; integer-cents measures, so accumulation order
  can't drift the result), and read-modify-writes them into the MV
  with the txn watermark carrying exactly-once. The WATERMARK IS THE
  REFRESH STATE: ``stream_txn=("mv:"+name, source_version)`` makes a
  replayed/concurrent refresh of an already-applied range a no-op, so
  crash-retry cannot double-apply a delta, and ``last_refreshed()``
  is read back from the target's own log — no side state files.
- **answers coarser-grain queries** (aggregate navigation): any GROUP
  BY over a SUBSET of the MV's dimensions re-aggregates the MV —
  sums of sums and sums of counts — touching O(|MV|) rows instead of
  the base table. ``answer()`` enforces the two correctness gates:
  the requested dims must be a subset of the MV's, and the MV must
  not be stale (``strict=True`` raises StaleViewError rather than
  silently serving an old snapshot; ``strict=False`` documents the
  eventual-consistency read the caller opted into).

Retracted-to-zero dims stay as n_rows=0 tombstones hidden by reads
(the IVM convention, streaming/ivm.py). Dims are arbitrary SQL
expressions over the source row; NULL-valued dims are excluded like
ivm's NULL keys (the merge key cannot be NULL) — a deployment that
needs a NULL group maps it to a sentinel in the dim expression.

100 TB: refresh moves |changed rows| → |touched dims| through one hash
aggregate, then rewrites O(MV files overlapping the touched key range)
of the (small) aggregate table. ``answer`` is a scan of the MV only.
The single synthetic merge key (``mv_key``, the dim tuple joined with
an unprintable separator) keeps the key-range file pruning of
merge_upsert effective and is a stat column by construction.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.txlog import TxTable
from .streaming.ivm import cents as _cents
from .streaming.ivm import signed_weight as _signed_weight

_SEP = "\x1f"
MEASURES = ("n_rows", "sum_cents")


class StaleViewError(RuntimeError):
    """answer(strict=True) on an MV behind its source."""


class SumCountView:
    """Sum/count materialized view over a TxTable source.

    ``dims`` maps output dim name → SQL expression over a source row;
    ``value_expr`` is the summed measure (folded to integer cents)."""

    def __init__(
        self,
        spark: SparkSession,
        source: TxTable,
        root: str,
        name: str,
        dims: dict[str, str],
        value_expr: str,
    ):
        self.spark = spark
        self.source = source
        self.name = name
        self.dims = dict(dims)
        self.value_expr = value_expr
        self.target = TxTable(spark, root)

    # -- construction -------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        source: TxTable,
        root: str,
        name: str,
        dims: dict[str, str],
        value_expr: str,
    ) -> "SumCountView":
        dim_fields = ", ".join(
            # dim types follow the expressions; store as string for the
            # key, native for the dims — evaluate once to take schema
            f"{d} {t}"
            for d, t in cls._dim_types(spark, source, dims).items()
        )
        empty = spark.createDataFrame(
            [],
            f"mv_key string, {dim_fields}, n_rows bigint, sum_cents bigint",
        )
        TxTable.create(spark, root, empty, stat_cols=["mv_key"])
        return cls(spark, source, root, name, dims, value_expr)

    @staticmethod
    def _dim_types(spark, source, dims) -> dict[str, str]:
        probe = source.read().limit(0).select(
            *[F.expr(e).alias(d) for d, e in dims.items()]
        )
        return {f.name: f.dataType.simpleString() for f in probe.schema.fields}

    # -- refresh --------------------------------------------------------

    def _app_id(self) -> str:
        return f"mv:{self.name}"

    def last_refreshed(self) -> int:
        """Source version the MV reflects (−1 = never refreshed) —
        read from the target's own txn watermark, no side state."""
        last = self.target.last_stream_batch(self._app_id())
        return -1 if last is None else last

    def _delta(self, cdf: DataFrame) -> DataFrame:
        # weight and cents are ivm.py's — ONE retraction-fold semantics
        # for both maintained-view paths (review r7)
        w = _signed_weight()
        dim_cols = [F.expr(e).alias(d) for d, e in self.dims.items()]
        key = F.concat_ws(
            _SEP, *[F.col(d).cast("string") for d in self.dims]
        )
        rows = cdf.select(
            *dim_cols, w.alias("__w"), _cents(F.expr(self.value_expr)).alias("__c")
        )
        # NULL dims are excluded (the merge key can't be NULL) — same
        # convention as streaming/ivm.py, documented in the module
        for d in self.dims:
            rows = rows.filter(F.col(d).isNotNull())
        return (
            rows.withColumn("mv_key", key)
            .groupBy("mv_key", *self.dims)
            .agg(
                F.sum("__w").cast("bigint").alias("n_rows"),
                F.sum(F.col("__w") * F.col("__c"))
                .cast("bigint")
                .alias("sum_cents"),
            )
        )

    def refresh(self) -> int | None:
        """Fold the CDF since the last refresh into the MV. Returns the
        new reflected source version, or None when already current.
        Crash-safe: the merge's txn watermark makes a replayed refresh
        of the same range a no-op (exactly-once, not just idempotent —
        this is a read-modify-write)."""
        have, want = self.last_refreshed(), self.source.version()
        if want <= have:
            return None
        delta = self._delta(self.source.changes(have, want))
        cur = self.target.read().select(
            "mv_key",
            F.col("n_rows").alias("__cur_n"),
            F.col("sum_cents").alias("__cur_s"),
        )
        merged = delta.join(cur, "mv_key", "left").select(
            "mv_key",
            *self.dims,
            (F.coalesce(F.col("__cur_n"), F.lit(0)) + F.col("n_rows"))
            .cast("bigint")
            .alias("n_rows"),
            (F.coalesce(F.col("__cur_s"), F.lit(0)) + F.col("sum_cents"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        pre = self.target.version()
        res = self.target.merge_upsert(
            merged, "mv_key", stream_txn=(self._app_id(), want)
        )
        if res == pre:
            # the range folded to ZERO delta rows (optimize-only /
            # meta-only / all-NULL-dim changes): merge_upsert early-
            # returns without writing the watermark, which would leave
            # the view stale FOREVER (every retry re-reads the same
            # empty range) — record the caught-up watermark with a
            # data-free txn commit instead (review r7)
            self.target.mark_stream_batch(self._app_id(), want)
        return want

    # -- reads ----------------------------------------------------------

    def read(self) -> DataFrame:
        """The MV at full grain, tombstones hidden."""
        return self.target.read().filter(F.col("n_rows") > 0).drop(
            "mv_key"
        )

    def is_stale(self) -> bool:
        return self.last_refreshed() < self.source.version()

    def answer(
        self, group_dims: list[str], strict: bool = True
    ) -> DataFrame:
        """Aggregate navigation: GROUP BY a SUBSET of the MV's dims,
        answered by re-aggregating the MV (sums of sums / counts) —
        the base table is never read."""
        unknown = [d for d in group_dims if d not in self.dims]
        if unknown:
            raise ValueError(
                f"dims {unknown} not in materialized grain "
                f"{sorted(self.dims)} — cannot navigate to a FINER grain"
            )
        if strict and self.is_stale():
            raise StaleViewError(
                f"MV {self.name!r} reflects source v{self.last_refreshed()} "
                f"< v{self.source.version()} — refresh() first "
                "(or pass strict=False for an eventually-consistent read)"
            )
        return (
            self.read()
            .groupBy(*group_dims)
            .agg(
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.sum("sum_cents").cast("bigint").alias("sum_cents"),
            )
        )


def view_root(base_root: str, name: str) -> str:
    """Conventional target location: <source>/_mv/<name>."""
    return posixpath.join(base_root, "_mv", name)
