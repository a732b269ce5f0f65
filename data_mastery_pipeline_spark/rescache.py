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

from pyspark.sql import DataFrame, SparkSession

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
    """Catalyst's CANONICALIZED analyzed plan — expression ids are
    renumbered deterministically by position (the machinery behind
    Spark's own ``sameResult``), so two independently-built frames for
    the same query print identically while literals are left verbatim.
    This replaced a regex strip of ``#N`` tokens, which also ate a
    literal string like ``'room#5'`` and merged keys for plans
    differing only in that constant (review r8 — an attribute id and a
    literal ending in a word char are lexically indistinguishable in
    the plan text; canonicalization is the structural fix)."""
    return (
        df._jdf.queryExecution().analyzed().canonicalized().toString()
    )


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
        # keys served by THIS instance as lazy readers: a later miss
        # must never LRU-evict a directory a caller might still hold
        # an unmaterialized DataFrame over (ADVICE r7). A weakref pin
        # on the returned object is NOT enough — a derived frame
        # (select/filter over the served reader) keeps the JVM scan
        # alive after the Python handle is collected (review r8) — so
        # the pin is session-scoped: this instance never evicts what
        # it served (bounded by distinct keys per session); eviction
        # reclaims entries from prior sessions / other instances,
        # which is the cache directory's actual growth vector.
        self._served: set[str] = set()
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
        # pin BEFORE any eviction runs: the entry this call writes or
        # serves must never be its own eviction victim
        self._served.add(key)
        if os.path.exists(marker):
            self.hits += 1
            os.utime(entry)  # LRU touch
        else:
            self.misses += 1
            df.write.mode("overwrite").parquet(entry)
            self._evict()
        return self.spark.read.schema(df.schema).parquet(entry)

    def _evict(self) -> None:
        dirs = [
            d
            for d in os.listdir(self.dir)
            if os.path.isdir(os.path.join(self.dir, d))
        ]
        excess = len(dirs) - self.max_entries
        if excess <= 0:
            return
        # the cap counts EVERY entry, but only unpinned ones (not
        # served by this instance — in-flight readers stay valid) are
        # eviction candidates; when everything is pinned the cache
        # temporarily overshoots rather than break a served reader
        candidates = sorted(
            (os.path.join(self.dir, d) for d in dirs if d not in self._served),
            key=lambda p: os.stat(p).st_mtime_ns,
        )
        for victim in candidates[:excess]:
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
