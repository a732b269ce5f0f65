"""JVM-side literal DataFrames (LocalRelation via SQL VALUES).

``spark.createDataFrame(rows, schema)`` in classic PySpark always routes
through ``sc.parallelize(rows)`` — a PYTHON-evaluated RDD with
``defaultParallelism`` slices. Every downstream action then launches one
Python-worker round trip per slice (32 on local[32]; measured ~0.5 s
warm per action for a 3-row frame), and a ``coalesce(1)`` before a file
write is catastrophic: the single task evaluates all parent slices
through Python SEQUENTIALLY (measured 5-6 s for a 3-row append —
guide §4: the JVM↔Python boundary is the cost, so don't put literal
seed rows behind it at all).

``local_frame`` builds the same relation as a SQL ``VALUES`` list — a
pure JVM ``LocalRelation``: no Python RDD, no Python workers, evaluated
inside whole-stage codegen like any other literal. At 100 TB the rule
is identical: driver-side literals (seed rows, audit rows, config
relations) belong in the PLAN, not in a parallelized dataset.

Supported literal types: None, bool, int, float (incl. nan/inf),
str, bytes, decimal.Decimal, datetime.date, datetime.datetime (naive =
session-timezone, the ``createDataFrame`` convention). Nested types are
supported only as NULL (enough for empty frames); sites with non-null
nested literals keep ``createDataFrame``.
"""

from __future__ import annotations

import datetime
import decimal
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ESCAPES = {
    "\\": "\\\\",
    "'": "\\'",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\0": "\\0",
}


def _quote(s: str) -> str:
    return "'" + "".join(_ESCAPES.get(ch, ch) for ch in s) + "'"


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "float('NaN')"
        if math.isinf(v):
            return "float('Infinity')" if v > 0 else "float('-Infinity')"
        return repr(v) + "D"  # repr round-trips doubles exactly
    if isinstance(v, str):
        return _quote(v)
    if isinstance(v, bytes):
        return f"X'{v.hex()}'"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            raise TypeError(
                "tz-aware datetime literals are ambiguous here; convert "
                "to naive session-timezone values first"
            )
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    raise TypeError(f"unsupported literal type {type(v).__name__}: {v!r}")


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """A DataFrame of driver-side literal ``rows`` with exactly
    ``schema`` (DDL string or StructType), built as a JVM
    ``LocalRelation`` — the drop-in fast twin of
    ``spark.createDataFrame(rows, schema)`` for scalar literals."""
    struct = (
        T._parse_datatype_string(schema) if isinstance(schema, str) else schema
    )
    casts = ", ".join(
        f"CAST(c{i} AS {f.dataType.simpleString()}) AS `{f.name}`"
        for i, f in enumerate(struct.fields)
    )
    rows = list(rows)
    n = len(struct.fields)
    for r in rows:
        if len(r) != n:
            raise ValueError(
                f"row arity {len(r)} != schema arity {n}: {tuple(r)!r}"
            )
    # One all-NULL marker row (filtered back out) makes every column
    # NULLABLE at analysis time, matching createDataFrame's schema
    # exactly (VALUES columns would otherwise infer non-nullable when
    # every literal is non-null, and downstream unions/appends compare
    # full schemas). It also carries the empty-rows case.
    vals = ", ".join(
        ["(1, " + "NULL, " * (n - 1) + "NULL)"]
        + [
            "(0, " + ", ".join(_lit(v) for v in r) + ")"
            for r in rows
        ]
    )
    alias = ", ".join(["m"] + [f"c{i}" for i in range(n)])
    return spark.sql(
        f"SELECT {casts} FROM (VALUES {vals}) AS t({alias}) WHERE m = 0"
    )
