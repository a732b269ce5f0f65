"""Privacy / governance operators for a training-data pipeline.

A corpus pipeline at 100 TB is also a COMPLIANCE pipeline: before data
leaves the trust boundary (serving exports, vendor shares, training
shards) the engine must be able to (a) pseudonymize identifiers without
breaking joins, (b) audit re-identification risk (k-anonymity,
l-diversity — Sweeney 2002 / Machanavajjhala et al. 2007, both public),
and (c) release aggregate statistics under differential privacy
(Dwork et al. 2006). The reference repo stops at row-level cleaning
(silver_processor.py's null/range gates); this module adds the
governance layer a real deployment bolts on top.

Everything here is expressed as Catalyst column expressions — no UDFs,
no collect — so the operators ride whole-stage codegen and scale as
ordinary projections/aggregations:

- **Tokenization** is one ``sha2(concat(salt, key), 256)`` projection:
  deterministic (same input → same token, so equi-joins survive
  pseudonymization) and non-reversible without the salt. At 100 TB the
  salt is a broadcast literal from a secrets manager, never a column.
- **k-anonymity / l-diversity audits** are single hash aggregates over
  the quasi-identifier tuple — one shuffle at O(groups), map-side
  partial aggregation included.
- **DP noise** must be DETERMINISTIC here so the DuckDB oracle can
  reproduce it bit-for-bit: the uniform draw comes from the md5 of the
  group key + salt (52 hex-derived bits → u ∈ (0,1)), then the standard
  inverse-CDF Laplace transform. A production deployment swaps the seed
  for a per-release random one; the mechanism (sensitivity-1 counts +
  Laplace(b)) is unchanged. Both engines evaluate the identical IEEE-754
  expression tree, so parity holds to the ulp.

Each builder returns a (Spark Column, DuckDB SQL fragment) PAIR built
from one shared template, so query and oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_POW_52 = float(1 << 52)


# ---------------------------------------------------------------- tokens


def token_col(col: Column, salt: str) -> Column:
    """Join-preserving pseudonym: sha2-256 over salt + value.

    NULL in → NULL out (concat null-propagates in both engines)."""
    return F.sha2(F.concat(F.lit(salt), col.cast("string")), 256)


def token_sql(expr: str, salt: str) -> str:
    """Oracle twin of :func:`token_col` (DuckDB ``sha256``)."""
    return f"sha256('{salt}' || CAST({expr} AS VARCHAR))"


def mask_name_col(col: Column) -> Column:
    """Irreversible display mask: keep the first 4 chars, drop the rest.

    (Masking is for HUMAN display; tokenization is for joins — a mask
    that kept enough characters to re-identify would defeat both.)"""
    return F.concat(F.substring(col, 1, 4), F.lit("***"))


def mask_name_sql(expr: str) -> str:
    return f"substr({expr}, 1, 4) || '***'"


# ------------------------------------------------------------ laplace dp


def laplace_noise_col(key: Column, salt: str, scale_b: float) -> Column:
    """Deterministic Laplace(b) draw seeded from md5(key || salt).

    u = (h + 0.5) / 2^52 with h the first 13 hex chars of the md5 —
    52 uniform bits, u ∈ (0,1) strictly (the +0.5 keeps u off both
    endpoints, so log(1 − 2|u−½|) is finite). Inverse CDF:
    noise = −b · sign(u−½) · ln(1 − 2|u−½|).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(TWO_POW_52)
    c = u - F.lit(0.5)
    return (
        F.lit(-scale_b)
        * F.signum(c)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    )


def laplace_noise_sql(key_expr: str, salt: str, scale_b: float) -> str:
    """Oracle twin of :func:`laplace_noise_col` — the identical
    IEEE-754 expression tree in DuckDB syntax (hex→int via the
    ``'0x…'::BIGINT`` cast; natural log is ``ln``)."""
    h = (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'),"
        f" 1, 13))::BIGINT)"
    )
    u = f"(({h} + 0.5) / {TWO_POW_52!r})"
    c = f"({u} - 0.5)"
    return f"(-{scale_b!r} * sign({c}) * ln(1.0 - 2.0 * abs({c})))"


# ------------------------------------------------- row/column policies


class GovernancePolicy:
    """Declarative row+column security policy (the RLS / column-mask
    pair every warehouse ships): ``row_filter`` is a SQL predicate the
    reader's rows must satisfy; ``masks`` maps column name → the
    replacement expression the reader sees instead of the raw value.

    Applied as plain Catalyst filter+projection (:func:`apply_policy`),
    so the policy PUSHES DOWN like any predicate — at 100 TB the row
    filter prunes partitions/files before governance ever touches a
    row, and masked columns never leave the scan projection. Policies
    compose with tokenization (a mask can BE a token expression)."""

    def __init__(self, row_filter: str, masks: dict[str, Column]):
        self.row_filter = row_filter
        self.masks = dict(masks)


def apply_policy(df, policy: GovernancePolicy):
    """Enforce ``policy`` on ``df``: filter, then replace each masked
    column in place (schema keeps the reader-facing shape)."""
    out = df.filter(F.expr(policy.row_filter))
    for col, repl in policy.masks.items():
        out = out.withColumn(col, repl)
    return out
