"""Versioned parquet tables — time travel and rollback without a table
format.

Layout:

    table_root/
      v=00001/part-*.parquet      immutable snapshot dirs
      v=00002/part-*.parquet
      _VERSION                    single-line pointer to the live version

Write protocol: materialize the new snapshot dir COMPLETELY, then swing
the `_VERSION` pointer with a write-temp-then-rename (rename is atomic
on HDFS and on POSIX local filesystems — the same primitive Delta's
_last_checkpoint and Hive's pointer files rely on). Readers resolve the
pointer first, then read only that snapshot dir — a reader never sees a
half-written snapshot because the pointer moves only after the data is
durable, and old snapshots stay readable until vacuumed (snapshot
isolation for readers, last-writer-wins for writers; this is NOT a
multi-writer transaction log — a real table format adds conflict
detection, not different read semantics).

All filesystem access goes through the Hadoop FileSystem API so the
same code runs against HDFS/S3A paths, not just local disk.

Capability parity note: the reference has no versioning at all — its
silver overwrite (silver_processor.py:144-146) destroys yesterday's
output. This module is the engine-level answer to "query what the table
looked like before the bad backfill" and "roll it back".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_VERSION"


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return hpath.getFileSystem(conf), hpath, jvm


def _read_pointer(spark: SparkSession, root: str) -> int | None:
    fs, _, jvm = _fs(spark, root)
    p = jvm.org.apache.hadoop.fs.Path(f"{root}/{_POINTER}")
    if not fs.exists(p):
        # Pointer momentarily absent (FS without atomic-replace support
        # mid-swing) or never written: newest COMMITTED snapshot wins —
        # only dirs with Spark's _SUCCESS marker qualify, so a mid-write
        # or crashed-writer dir can never be served as live.
        vs = [
            v
            for v in versions(spark, root)
            if fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{_vdir(root, v)}/_SUCCESS")
            )
        ]
        return max(vs) if vs else None
    stream = fs.open(p)
    try:
        data = bytes(stream.readAllBytes()).decode("utf-8").strip()
    finally:
        stream.close()
    return int(data)


def _write_pointer(spark: SparkSession, root: str, version: int) -> None:
    fs, _, jvm = _fs(spark, root)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{root}/{_POINTER}.tmp")
    final = jvm.org.apache.hadoop.fs.Path(f"{root}/{_POINTER}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(str(version).encode("utf-8")))
    finally:
        out.close()
    # Atomic swing: FileContext.rename(…, Rename.OVERWRITE) replaces the
    # old pointer in one operation on HDFS and POSIX local FS — no
    # window where _VERSION is missing (delete-then-rename had one).
    try:
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            final.toUri(), conf
        )
        opts = spark.sparkContext._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, final, opts)
    except Exception as ex:
        # Fall back to delete-then-rename ONLY when the FS genuinely
        # lacks FileContext support (readers then cover the gap via the
        # committed-snapshot fallback above). A real rename failure —
        # permissions, quota, missing parent — must stay loud, not be
        # silently downgraded to the racy path.
        msg = str(ex)
        unsupported = (
            "UnsupportedFileSystem" in msg
            or "No AbstractFileSystem" in msg
            or isinstance(ex, (TypeError, AttributeError))  # py4j lookup
        )
        if not unsupported:
            raise
        fs.delete(final, False)
        if not fs.rename(tmp, final):
            raise IOError(f"pointer rename failed for {root} v{version}")


def _vdir(root: str, version: int) -> str:
    return f"{root}/v={version:05d}"


def write_version(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Write ``df`` as the next snapshot of the table at ``root`` and
    swing the live pointer to it. Returns the new version number.

    The next version is max(live pointer, newest dir ON DISK) + 1
    (review r6): a writer that crashed after creating its snapshot dir
    but before the pointer swing leaves an orphan dir; pointer+1 alone
    would collide with it forever (``errorifexists``), wedging every
    future write. Skipping past the orphan keeps the invariant that a
    version dir, once referenced by the pointer, is complete — the
    orphan is unreferenced garbage that vacuum() may reap."""
    current = _read_pointer(spark, root) or 0
    on_disk = versions(spark, root)
    new = max(current, on_disk[-1] if on_disk else 0) + 1
    df.write.mode("errorifexists").parquet(_vdir(root, new))
    _write_pointer(spark, root, new)
    return new


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot: ``version=None`` resolves the live pointer (the
    time-travel read is just an explicit version)."""
    v = version if version is not None else _read_pointer(spark, root)
    if v is None:
        raise FileNotFoundError(f"no versions at {root}")
    return spark.read.parquet(_vdir(root, v))


def versions(spark: SparkSession, root: str) -> list[int]:
    """All snapshot versions present on disk, ascending."""
    fs, hroot, jvm = _fs(spark, root)
    if not fs.exists(hroot):
        return []
    out = []
    for st in fs.listStatus(hroot):
        name = st.getPath().getName()
        if name.startswith("v="):
            out.append(int(name[2:]))
    return sorted(out)


def rollback(spark: SparkSession, root: str, to_version: int) -> int:
    """Make ``to_version`` live again by writing it as a NEW version
    (append-only history — the bad version stays inspectable, exactly
    like a table-format RESTORE)."""
    return write_version(spark, root, read_version(spark, root, to_version))


def vacuum(spark: SparkSession, root: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest ``keep_last`` snapshot dirs (never the
    live one). Returns the versions removed."""
    live = _read_pointer(spark, root)
    vs = versions(spark, root)
    drop = [v for v in vs[:-keep_last] if v != live] if keep_last > 0 else []
    fs, _, jvm = _fs(spark, root)
    for v in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(_vdir(root, v)), True)
    return drop
