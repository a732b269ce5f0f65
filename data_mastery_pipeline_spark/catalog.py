"""Multi-table consistent snapshots: a catalog-level commit log.

The one transactional boundary a single-table log format cannot give
is CROSS-TABLE atomicity: a reader joining `orders_agg` with
`lineitem_agg` mid-maintenance can see table A's new state against
table B's old one. The public solution is a catalog whose commits pin
a CONSISTENT set of table versions (Project Nessie's commit model /
Unity's multi-table snapshots): writers update the member tables
first, then publish one catalog commit mapping every table to the
version that belongs together; readers resolve table versions through
the catalog and never observe a partial publish.

Shape here:

- ``TableCatalog`` keeps its own put-if-absent JSON log (the exact
  os.link discipline of sources/txlog.py — one winner per catalog
  version, no TOCTOU) where each commit is the full {table: version}
  mapping plus the delta that produced it.
- ``publish({name: version})`` is the atomic boundary. Member-table
  commits that happened but were never published are INVISIBLE to
  catalog readers (they read like WAP staging) — a crash between
  table commits and publish leaves readers on the previous consistent
  snapshot, and the retry's table ops must be idempotent (use the
  txn-watermarked verbs: append_stream_batch / merge_upsert with
  stream_txn) so re-running them re-commits nothing before the
  publish lands.
- ``read(name, catalog_version=None)`` = time travel through the
  catalog: the table's pinned version at that catalog commit.
- ``snapshot()`` returns the whole consistent mapping for a
  multi-table reader to hold for the duration of a job.

100 TB: the catalog log carries O(tables) bytes per commit and the
publish is one hard-link — table data volume never appears on this
path. Catalog time travel composes with each member's own log
(expire/vacuum still bound retention per table).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from .sources.txlog import TxTable


class CatalogConflictError(RuntimeError):
    """Concurrent catalog publish lost the put-if-absent race."""


class TableCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._tables: dict[str, TxTable] = {}

    # -- membership -------------------------------------------------------

    def register(self, name: str, table: TxTable) -> "TableCatalog":
        self._tables[name] = table
        return self

    def table(self, name: str) -> TxTable:
        return self._tables[name]

    # -- log --------------------------------------------------------------

    def _path(self, version: int) -> str:
        return os.path.join(self.root, f"{version:020d}.json")

    def version(self) -> int:
        """Latest catalog version, or -1 (nothing published yet)."""
        vs = [
            int(f.split(".")[0])
            for f in os.listdir(self.root)
            if f.endswith(".json") and not f.startswith(".")
        ]
        return max(vs) if vs else -1

    def _put_if_absent(self, payload: str, final: str) -> bool:
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    # -- publish ----------------------------------------------------------

    def publish(self, updates: dict[str, int] | None = None) -> int:
        """Atomically publish a consistent snapshot: the previous
        mapping overlaid with ``updates`` ({table: version}; default =
        every registered table's CURRENT version). Exactly one of two
        concurrent publishers wins a catalog version; the loser gets
        CatalogConflictError and must re-read + retry (its member-table
        commits are already durable and idempotent to re-publish)."""
        if updates is None:
            updates = {n: t.version() for n, t in self._tables.items()}
        unknown = set(updates) - set(self._tables)
        if unknown:
            raise KeyError(f"unregistered tables: {sorted(unknown)}")
        cur = self.version()
        mapping = dict(self.snapshot(cur)) if cur >= 0 else {}
        mapping.update(updates)
        payload = json.dumps(
            {"mapping": mapping, "delta": updates}, sort_keys=True
        )
        new_v = cur + 1
        if not self._put_if_absent(payload, self._path(new_v)):
            raise CatalogConflictError(
                f"catalog version {new_v} was taken — re-read and retry"
            )
        return new_v

    # -- consistent reads ---------------------------------------------------

    def snapshot(self, catalog_version: int | None = None) -> dict[str, int]:
        """The {table: version} mapping at a catalog commit (default
        latest). Raises on an empty catalog."""
        v = self.version() if catalog_version is None else catalog_version
        if v < 0:
            raise LookupError("catalog has no published snapshot yet")
        with open(self._path(v), encoding="utf-8") as f:
            return json.load(f)["mapping"]

    def read(
        self, name: str, catalog_version: int | None = None
    ) -> DataFrame:
        """Read a member table AT ITS PUBLISHED VERSION — unpublished
        member-table commits are invisible, so two reads in one job see
        versions that were committed to belong together."""
        pinned = self.snapshot(catalog_version)
        if name not in pinned:
            raise LookupError(f"table {name!r} not in published snapshot")
        return self._tables[name].read(version=pinned[name])

    def history(self) -> list[dict]:
        """Every catalog commit (version, mapping, delta) — the
        cross-table time-travel axis."""
        out = []
        for v in range(self.version() + 1):
            with open(self._path(v), encoding="utf-8") as f:
                d = json.load(f)
            out.append(
                {"version": v, "mapping": d["mapping"], "delta": d["delta"]}
            )
        return out
