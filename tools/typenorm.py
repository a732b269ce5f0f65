"""Type-faithful result normalization shared by the local oracle-parity
suite and the driver-contract emulator.

Why this exists (round-4 lesson, VERDICT r04 §wrong-1): the driver's
value hash serializes *typed* values — DuckDB returns ``sum(CASE …)``
as HUGEINT (int128), which its pandas/arrow fetch path surfaces as
float64/decimal128 and therefore hashes differently from Spark's
BIGINT, while ``fetchall()`` flattens both to Python ``int`` and hides
the difference.  The round-4 local mirror used ``fetchall`` + ``str``
and passed where the driver failed (``profile_events``).

The contract enforced here is stricter than value equality:

1. Per-column *type classes* must match between engines.  Classes:
   ``null bool i f str ts date dec hug other`` — all ≤64-bit integers
   are one class (the driver's greens prove widths don't matter), but
   int vs float vs decimal vs hugeint are distinct (they provably do).
2. **No result column may be HUGEINT or DECIMAL in either engine.**
   DuckDB→pandas turns both into float64 while Spark surfaces BIGINT /
   ``decimal.Decimal`` objects, so their driver-side reprs diverge even
   when values are equal.  The repo convention (queries.py:12) is to
   ``CAST(sum(…) AS BIGINT)`` / ``AS DOUBLE`` in every oracle; this
   module turns that convention into a hard local failure so the mirror
   predicts the driver instead of flattering it.
"""

from __future__ import annotations

import math
from decimal import Decimal

# ---------------------------------------------------------------- classes

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "REAL", "DOUBLE"}


def duck_type_class(type_str: str) -> str:
    """Map a DuckDB type string (``str(rel.types[i])``) to a class tag."""
    t = str(type_str).upper()
    if t == "HUGEINT" or t == "UHUGEINT":
        return "hug"
    if t.startswith("DECIMAL"):
        return "dec"
    if t in _DUCK_INT:
        return "i"
    if t in _DUCK_FLOAT:
        return "f"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "str"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "DATE":
        return "date"
    if t == "BOOLEAN":
        return "bool"
    return "other"


def spark_type_class(dt) -> str:
    """Map a pyspark.sql.types.DataType to the same class tags."""
    name = type(dt).__name__
    if name in ("ByteType", "ShortType", "IntegerType", "LongType"):
        return "i"
    if name in ("FloatType", "DoubleType"):
        return "f"
    if name == "DecimalType":
        return "dec"
    if name in ("StringType", "VarcharType", "CharType"):
        return "str"
    if name in ("TimestampType", "TimestampNTZType"):
        return "ts"
    if name == "DateType":
        return "date"
    if name == "BooleanType":
        return "bool"
    return "other"


def forbidden_columns(cols, classes) -> list:
    """Columns whose type class the driver cannot hash consistently."""
    return [c for c, k in zip(cols, classes) if k in ("hug", "dec")]


# ---------------------------------------------------------------- values

def norm_cell(v, type_class: str):
    """Normalize one cell, tagged with its column's type class.

    Within-class normalization matches the round-1..4 behavior (floats
    rounded to 6 places, NaN-safe, everything else stringified); the
    class tag is what round 5 adds — an int-typed 0 and a float-typed
    0.0 no longer collide.
    """
    if v is None:
        return ("null",)
    if type_class == "f" or isinstance(v, float):
        if isinstance(v, float) and math.isnan(v):
            return ("nan",)
        return ("f", round(float(v), 6))
    if type_class == "bool" or isinstance(v, bool):
        return ("bool", bool(v))
    if type_class in ("hug", "dec") or isinstance(v, Decimal):
        # Kept distinct from "i"/"f" on purpose: these columns are
        # contract violations and also fail forbidden_columns().
        return (type_class, str(v))
    if type_class == "i":
        return ("i", int(v))
    return (type_class, str(v))


def norm_rows(rows, columns, classes):
    """Order-insensitive normalized row set (columns sorted by name)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(norm_cell(r[i], classes[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_results(s_cols, s_classes, s_rows, d_cols, d_classes, d_rows):
    """The full driver-prediction comparison, shared by the local mirror
    (tests/test_oracle_parity.py) and the emulator (tools/
    drive_contract.py) so the two can never silently diverge.

    Returns a dict:
      cols_match       sorted column names equal
      forbidden        HUGEINT/DECIMAL result columns (either engine)
      class_mismatch   {col: (spark_class, duck_class)} where they differ
      rows_match       row counts equal
      values_match     normalized row sets equal (only meaningful when
                       everything above is clean)
      spark_only/duck_only  up to 5 normalized rows unique to each side
    """
    res = {
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "forbidden": forbidden_columns(d_cols, d_classes)
        + forbidden_columns(s_cols, s_classes),
        "rows_match": len(s_rows) == len(d_rows),
        "class_mismatch": {},
        "values_match": False,
        "spark_only": [],
        "duck_only": [],
    }
    if res["cols_match"]:
        sp_by = dict(zip(s_cols, s_classes))
        du_by = dict(zip(d_cols, d_classes))
        res["class_mismatch"] = {
            c: (sp_by[c], du_by[c]) for c in sp_by if sp_by[c] != du_by[c]
        }
    if res["cols_match"] and res["rows_match"]:
        a = norm_rows(s_rows, s_cols, s_classes)
        b = norm_rows(d_rows, d_cols, d_classes)
        res["values_match"] = a == b
        if not res["values_match"]:
            bset, aset = set(b), set(a)
            res["spark_only"] = [r for r in a if r not in bset][:5]
            res["duck_only"] = [r for r in b if r not in aset][:5]
    res["ok"] = bool(
        res["cols_match"]
        and res["rows_match"]
        and not res["forbidden"]
        and not res["class_mismatch"]
        and res["values_match"]
    )
    return res
