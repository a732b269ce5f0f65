"""Catalog statistics for join planning — the ANALYZE TABLE loop.

The txlog format's footer stats serve file pruning, and AQE re-plans
at RUNTIME — but neither feeds cardinality into the one decision that
matters most up front: broadcast vs shuffle. Two places static
planning goes wrong without table stats:

- **Derived relations**: Catalyst's ``sizeInBytes`` for an aggregate
  or a non-pushed filter defaults to (a fraction of) the CHILD's
  size, so a `groupBy` that provably collapses a 100 TB fact to a
  10k-row dim still plans as a sort-merge join.
- **Opaque sources**: Python DataSources / JDBC relations report
  ``spark.sql.defaultSizeInBytes`` (effectively infinite), so they
  are never auto-broadcast.

AQE does convert SMJ→BHJ at runtime — but only AFTER both sides'
shuffle map stages have executed (the decision point is query-stage
materialization), so the 100 TB side's shuffle WRITE is already paid.
A stats-informed plan broadcasts up front and never shuffles the big
side. That is the gap this module closes, the classic warehouse
ANALYZE → CBO loop:

- :func:`analyze` — one aggregate pass over a DataFrame: row count,
  per-column approximate NDV (HLL sketch — exact distinct would be a
  second full shuffle at 100 TB; ``exact=True`` exists for oracle
  parity at test scale), null counts, and an average row width from
  the observed schema.
- :class:`StatsCatalog` — persists stats relations as JSON under a
  catalog dir, keyed by table name (the ANALYZE results live with the
  data, not in-process).
- :func:`estimate_rows` — post-filter cardinality by the standard
  selectivity rules (equality → 1/NDV, range → 1/3, the System-R
  defaults).
- :func:`stats_informed_join` — joins two relations, broadcasting a
  side iff its ESTIMATED bytes (rows × avg width, after the caller's
  stated filters) clear the broadcast threshold. Falls back to a
  plain join (AQE still applies) when neither side qualifies.

Reference surface: the reference has no optimizer at all (its joins
are hand-ordered pandas merges); this is the public ANALYZE/CBO
pattern every warehouse ships, scoped to the one decision Spark's
static planner cannot make without stats.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conservative per-type in-memory widths (bytes) for row-size
# estimation; strings/binaries fall back to an observed average
_FIXED_WIDTH = {
    "boolean": 1,
    "tinyint": 1,
    "smallint": 2,
    "int": 4,
    "integer": 4,
    "float": 4,
    "date": 4,
    "bigint": 8,
    "long": 8,
    "double": 8,
    "timestamp": 8,
    "timestamp_ntz": 8,
}


@dataclass
class TableStats:
    row_count: int
    ndv: dict[str, int]
    null_count: dict[str, int]
    avg_col_bytes: dict[str, float]

    @property
    def avg_row_bytes(self) -> float:
        return sum(self.avg_col_bytes.values())

    def estimated_bytes(self, rows: int | None = None) -> int:
        n = self.row_count if rows is None else rows
        return int(n * self.avg_row_bytes)

    def to_json(self) -> str:
        return json.dumps(
            {
                "row_count": self.row_count,
                "ndv": self.ndv,
                "null_count": self.null_count,
                "avg_col_bytes": self.avg_col_bytes,
            }
        )

    @classmethod
    def from_json(cls, text: str) -> "TableStats":
        d = json.loads(text)
        return cls(
            row_count=int(d["row_count"]),
            ndv={k: int(v) for k, v in d["ndv"].items()},
            null_count={k: int(v) for k, v in d["null_count"].items()},
            avg_col_bytes={
                k: float(v) for k, v in d["avg_col_bytes"].items()
            },
        )


def analyze(df: DataFrame, exact: bool = False) -> TableStats:
    """ONE aggregate pass (map-side combined, no row shuffle beyond
    the final 1-row reduce): count, per-column NDV, null counts, and
    observed average byte widths for variable-width columns.
    ``exact=True`` swaps the HLL NDV for countDistinct — test-scale /
    oracle-parity only; the default is the 100 TB path."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__rc")]
    var_width_cols = []
    for f in df.schema.fields:
        c = f.name
        ndv_fn = F.count_distinct if exact else F.approx_count_distinct
        aggs.append(ndv_fn(F.col(c)).cast("bigint").alias(f"__ndv_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__nn_{c}")
        )
        t = f.dataType.simpleString()
        if t not in _FIXED_WIDTH:
            var_width_cols.append(c)
            probe = (
                F.length(F.col(c).cast("binary"))
                if t in ("string", "binary")
                else F.length(F.to_json(F.struct(F.col(c))))
            )
            aggs.append(F.avg(probe).alias(f"__w_{c}"))
    row = df.agg(*aggs).first()
    ndv, nulls, widths = {}, {}, {}
    for f in df.schema.fields:
        c = f.name
        ndv[c] = int(row[f"__ndv_{c}"])
        nulls[c] = int(row[f"__nn_{c}"])
        t = f.dataType.simpleString()
        if t in _FIXED_WIDTH:
            widths[c] = float(_FIXED_WIDTH[t])
        else:
            w = row[f"__w_{c}"]
            widths[c] = float(w) if w is not None else 8.0
    return TableStats(
        row_count=int(row["__rc"]),
        ndv=ndv,
        null_count=nulls,
        avg_col_bytes=widths,
    )


@dataclass
class StatsCatalog:
    """ANALYZE results persisted under ``root`` as one JSON file per
    table — the catalog side of the CBO loop."""

    root: str
    _cache: dict = field(default_factory=dict)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.stats.json")

    def put(self, name: str, stats: TableStats) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._path(name) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(stats.to_json())
        os.replace(tmp, self._path(name))
        self._cache[name] = stats

    def analyze(
        self, name: str, df: DataFrame, exact: bool = False
    ) -> TableStats:
        stats = analyze(df, exact=exact)
        self.put(name, stats)
        return stats

    def get(self, name: str) -> TableStats | None:
        if name not in self._cache:
            p = self._path(name)
            if not os.path.exists(p):
                return None
            with open(p) as fh:
                self._cache[name] = TableStats.from_json(fh.read())
        return self._cache[name]


def estimate_rows(
    stats: TableStats,
    eq_filters: list[str] = (),
    range_filters: list[str] = (),
) -> int:
    """Post-filter cardinality by the System-R selectivity defaults:
    each equality predicate on ``col`` multiplies by 1/NDV(col); each
    range predicate by 1/3. Conservative floor of 1 row."""
    est = float(stats.row_count)
    for c in eq_filters:
        est /= max(1, stats.ndv.get(c, 1))
    for _ in range_filters:
        est /= 3.0
    return max(1, int(est))


def stats_informed_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_stats: TableStats | None = None,
    right_stats: TableStats | None = None,
    how: str = "inner",
    threshold_bytes: int | None = None,
) -> DataFrame:
    """Join with the broadcast decision made from CATALOG stats rather
    than Catalyst's plan-size guess. The smaller ESTIMATED side is
    broadcast iff its estimated bytes clear the threshold (default:
    the session's ``autoBroadcastJoinThreshold``); otherwise a plain
    join (AQE's runtime conversion still applies downstream)."""
    spark = left.sparkSession
    if threshold_bytes is None:
        raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        threshold_bytes = _parse_bytes(raw)
    cands = []
    if left_stats is not None:
        cands.append(("left", left_stats.estimated_bytes()))
    if right_stats is not None:
        cands.append(("right", right_stats.estimated_bytes()))
    cands = [c for c in cands if 0 <= c[1] <= threshold_bytes]
    if cands:
        side = min(cands, key=lambda c: c[1])[0]
        if side == "left":
            return F.broadcast(left).join(right, on, how)
        return left.join(F.broadcast(right), on, how)
    return left.join(right, on, how)


def _parse_bytes(raw: str) -> int:
    raw = str(raw).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if raw.endswith(suffix):
            return int(float(raw[: -len(suffix)])) * m
    return int(raw) * mult


def filtered_stats(
    base: TableStats,
    eq_filters: list[str] = (),
    range_filters: list[str] = (),
) -> TableStats:
    """Estimated stats for the FILTERED relation — the selectivity leg
    of the CBO loop (System-R defaults via :func:`estimate_rows`).
    With ``spark.sql.cbo.enabled=false`` (the default), Catalyst keeps
    the CHILD's sizeInBytes for a Filter node (measured: a 1/5
    equality cut on orders leaves the static estimate untouched), so a
    selective filter is invisible to static broadcast planning; the
    catalog sees it. Feed the result to :func:`stats_informed_join` /
    ``operators.joins.star_join(stats=...)``."""
    rows = estimate_rows(base, eq_filters, range_filters)
    return TableStats(
        row_count=rows,
        ndv={c: min(v, rows) for c, v in base.ndv.items()},
        null_count=dict(base.null_count),
        avg_col_bytes=dict(base.avg_col_bytes),
    )


def derived_stats_for_agg(
    base: TableStats,
    group_cols: list[str],
    n_agg_cols: int = 1,
    agg_col_bytes: float = 8.0,
) -> TableStats:
    """Estimated stats for ``base.groupBy(group_cols).agg(...)`` — the
    DERIVED-relation leg of the CBO loop. Catalyst's sizeInBytes for
    an aggregate tracks the CHILD's size (a groupBy that collapses a
    100 TB fact to NDV rows still plans as a sort-merge join); the
    catalog knows better: output rows = min(∏ NDV(group col),
    base rows) — the standard independence estimate — and output width
    = the group columns' observed widths plus ``n_agg_cols`` numeric
    aggregates. Feed the result to :func:`stats_informed_join` as the
    dim side's stats."""
    rows = 1
    for c in group_cols:
        rows *= max(1, base.ndv.get(c, base.row_count))
        if rows >= base.row_count:
            rows = base.row_count
            break
    widths = {c: base.avg_col_bytes.get(c, 8.0) for c in group_cols}
    for i in range(n_agg_cols):
        widths[f"__agg_{i}"] = agg_col_bytes
    return TableStats(
        row_count=int(rows),
        ndv={c: min(base.ndv.get(c, rows), rows) for c in group_cols},
        null_count={c: 0 for c in group_cols},
        avg_col_bytes=widths,
    )
