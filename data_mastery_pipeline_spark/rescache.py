"""Query result cache: plan-keyed, input-fingerprinted, self-invalidating.

The serving-layer feature every warehouse front-end ships (Snowflake
result cache / BigQuery cached results / Databricks SQL result cache):
a repeated query over unchanged inputs is answered from a materialized
result instead of recomputing — and the cache key makes STALENESS
impossible by construction, rather than relying on TTLs:

    key = sha256( normalized logical plan  +  input-file fingerprint )

- **Normalized plan**: the analyzed logical plan's string form with
  Catalyst's per-session expression ids (``#123``) stripped — two
  independently-built DataFrames for the same query normalize to the
  same text, while any semantic difference (another filter constant, a
  different column) changes it. This is the same idea as Spark's own
  plan cache keys, applied at the result layer.
- **Input fingerprint**: ``df.inputFiles()`` → sorted (path, size,
  mtime) digest. Any append/compaction/overwrite under a scanned table
  changes its file listing and thereby the key — the stale entry is
  simply never addressed again (no invalidation protocol to get wrong;
  superseded entries age out by LRU eviction). Works unchanged over
  txlog tables: a new commit adds data files, so the fingerprint moves.

Non-goals, stated: queries with non-deterministic expressions
(rand/uuid/current_timestamp) are REFUSED (cached nondeterminism is a
wrong-results bug, not a cache); streaming frames are refused (no
stable input set). The cache stores results as parquet under one dir
per key — at 100 TB the cache holds RESULTS (dashboards' aggregates,
KBs-MBs), never inputs, and eviction is size-capped LRU.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import weakref

from pyspark.sql import DataFrame, SparkSession

# anchored to attribute-reference context (a name/paren/bracket/quote
# immediately before the '#'): a bare literal string '#123' inside a
# plan must NOT be stripped, or two plans differing only in that
# constant would merge keys (ADVICE r7)
_EXPR_ID = re.compile(r"(?<=[\w)\]`'\"])#\d+L?")
# in-memory leaves print only their SCHEMA, never their rows — two
# DataFrames with equal schemas but different data would share a key,
# so such plans are refused (ADVICE r7). Spark 4 plans createDataFrame
# as `LogicalRDD [cols], false`; the literal-rows form is
# `LocalRelation [cols]` (its `<empty>` variant is safe — no data to
# miss). `Range (…)` is NOT refused: its plan text carries the full
# start/end/step, so the key sees everything.
_LOCAL_REL = re.compile(r"LocalRelation (?!<empty>)|LogicalRDD ")
# match CALLS only (trailing paren): a COLUMN named uuid/now/shuffle
# prints as `uuid#123` in the analyzed plan and must not be refused —
# only the function invocation `uuid()` / `rand(seed)` is
# nondeterministic (review r7; false-refusal pinned by test)
_NONDET = re.compile(
    r"\b(rand|randn|uuid|current_timestamp|current_date|now|"
    r"monotonically_increasing_id|shuffle|input_file_name)\(",
    re.IGNORECASE,
)


class NondeterministicPlanError(ValueError):
    """Refusing to cache a plan containing non-deterministic exprs."""


class UncacheablePlanError(ValueError):
    """Refusing to cache a plan whose inputs the key cannot see:
    streaming frames, in-memory LocalRelations, or plans with no
    scanned files at all (the fingerprint would be a constant)."""


def normalized_plan(df: DataFrame) -> str:
    """Analyzed logical plan with session-local expression ids removed."""
    return _EXPR_ID.sub("#", df._jdf.queryExecution().analyzed().toString())


def input_fingerprint(df: DataFrame) -> str:
    """Digest of the scanned files' (path, size, mtime) — any change to
    any input file moves the key."""
    h = hashlib.sha256()
    for uri in sorted(df.inputFiles()):
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        try:
            st = os.stat(path)
            h.update(f"{uri}|{st.st_size}|{st.st_mtime_ns}\n".encode())
        except OSError:
            h.update(f"{uri}|unstat\n".encode())
    return h.hexdigest()


class ResultCache:
    """Parquet-backed result cache with LRU size-cap eviction."""

    def __init__(
        self, spark: SparkSession, cache_dir: str, max_entries: int = 64
    ):
        self.spark = spark
        self.dir = cache_dir
        self.max_entries = max_entries
        self.hits = 0
        self.misses = 0
        # weakrefs to DataFrames handed out as lazy readers: a later
        # miss must not LRU-evict a directory a caller still holds an
        # unmaterialized DataFrame over (ADVICE r7). The pin lives
        # exactly as long as the served object — once the caller drops
        # it, the entry is evictable again (no unpin protocol to get
        # wrong, no permanent pin defeating the LRU).
        self._served: dict[str, list] = {}
        os.makedirs(cache_dir, exist_ok=True)

    def key_for(self, df: DataFrame) -> str:
        if df.isStreaming:
            raise UncacheablePlanError(
                "streaming DataFrames have no stable input set — refused"
                " (as the module docstring promises; ADVICE r7)"
            )
        plan = normalized_plan(df)
        bad = _NONDET.search(plan)
        if bad:
            raise NondeterministicPlanError(
                f"plan contains non-deterministic expression {bad.group()!r}"
                " — caching it would freeze a value that must vary"
            )
        if _LOCAL_REL.search(plan):
            raise UncacheablePlanError(
                "plan reads an in-memory relation (LocalRelation /"
                " LogicalRDD: rows invisible to the plan text AND the"
                " file fingerprint) — two different datasets would"
                " share a key"
            )
        files = df.inputFiles()
        if not files:
            raise UncacheablePlanError(
                "plan scans no files — the input fingerprint would be a"
                " constant and could not detect data changes"
            )
        return hashlib.sha256(
            (plan + "\n" + input_fingerprint(df)).encode()
        ).hexdigest()

    def _entry(self, key: str) -> str:
        return os.path.join(self.dir, key)

    def get_or_compute(self, df: DataFrame) -> DataFrame:
        """Serve ``df``'s result from cache when the key matches;
        otherwise compute once, store, and serve the stored copy (so
        hit and miss return the same physical relation)."""
        key = self.key_for(df)
        entry = self._entry(key)
        marker = os.path.join(entry, "_SUCCESS")
        if os.path.exists(marker):
            self.hits += 1
            os.utime(entry)  # LRU touch
        else:
            self.misses += 1
            df.write.mode("overwrite").parquet(entry)
            self._evict()
        out = self.spark.read.schema(df.schema).parquet(entry)
        self._served.setdefault(key, []).append(weakref.ref(out))
        return out

    def _pinned_keys(self) -> set:
        """Keys whose served DataFrames are still alive in the caller."""
        live = set()
        for k in list(self._served):
            refs = [r for r in self._served[k] if r() is not None]
            if refs:
                self._served[k] = refs
                live.add(k)
            else:
                del self._served[k]
        return live

    def _evict(self) -> None:
        pinned = self._pinned_keys()
        entries = [
            os.path.join(self.dir, d)
            for d in os.listdir(self.dir)
            if os.path.isdir(os.path.join(self.dir, d))
            and d not in pinned  # in-flight readers stay valid
        ]
        if len(entries) <= self.max_entries:
            return
        entries.sort(key=lambda p: os.stat(p).st_mtime_ns)
        for victim in entries[: len(entries) - self.max_entries]:
            shutil.rmtree(victim, ignore_errors=True)

    def stats(self) -> dict:
        return {
            "hits": self.hits,
            "misses": self.misses,
            "entries": sum(
                os.path.isdir(os.path.join(self.dir, d))
                for d in os.listdir(self.dir)
            ),
        }
