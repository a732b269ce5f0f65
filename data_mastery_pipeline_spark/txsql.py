"""SQL DML front-end for the transaction-log table format — the
surface a SQL-first user reaches for first:

    ss = TxSqlSession(spark)
    ss.register("events", table)
    ss.sql("DELETE FROM events WHERE value BETWEEN 0 AND 30")
    ss.sql("UPDATE events SET value = value + 1 WHERE user_id = 7")
    ss.sql("MERGE INTO events USING (SELECT ...) s ON events.id = s.id "
           "WHEN MATCHED THEN UPDATE SET * "
           "WHEN NOT MATCHED THEN INSERT *")
    ss.sql("ALTER TABLE events RENAME COLUMN value TO amount")
    ss.sql("SELECT amount, count(*) FROM events GROUP BY amount")

Design: a THIN dispatcher over the existing transactional verbs
(``delete_where`` / ``update_where`` / ``merge_upsert`` / the alters /
``restore``), not a second execution engine — SQL and the DataFrame
API land on the SAME commit paths, so the two front-ends cannot
diverge semantically (pinned by tests/test_sql_frontend.py: identical
op sequences through either API produce byte-identical table states).
SELECTs run through real ``spark.sql`` over per-call snapshot views of
the registered tables, so the full SQL surface (joins, windows,
subqueries) works unmodified against txlog data.

Why not Catalyst injection: Spark's SQL DML (UPDATE/DELETE/MERGE
statements) binds to DataSource-v2 catalogs implementing the JVM
SupportsRowLevelOperations API — not reachable from a pure-Python
format (the Python DataSource API is read/append-only). The honest
alternative is this explicit dispatcher with a DOCUMENTED grammar;
anything outside it raises :class:`UnsupportedSqlError` loudly rather
than mis-executing. The supported WHERE shape mirrors what the verbs
themselves index (a single column range — the stats-pruning contract):
``col BETWEEN lo AND hi`` / ``col = lit``.

Reference: the reference engine exposes its tables only through SQL
views (sql/schema.sql); this module closes the reverse direction —
SQL statements driving this repo's table format.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .localrel import local_frame
from .sources.txlog import TxTable


class UnsupportedSqlError(ValueError):
    """Statement outside the documented DML grammar — refused loudly
    (never guessed at)."""


_NUM = r"-?\d+(?:\.\d+)?"
_STR = r"'(?:[^']|'')*'"
_LIT = rf"(?:{_NUM}|{_STR})"
_ID = r"[A-Za-z_][A-Za-z_0-9]*"

# WHERE shapes the verbs can index: a single-column range / equality
_W_BETWEEN = re.compile(
    rf"^\s*({_ID})\s+BETWEEN\s+({_LIT})\s+AND\s+({_LIT})\s*$", re.I
)
_W_EQ = re.compile(rf"^\s*({_ID})\s*=\s*({_LIT})\s*$", re.I)

_DELETE = re.compile(
    rf"^\s*DELETE\s+FROM\s+({_ID})\s+WHERE\s+(.*?)\s*$", re.I | re.S
)
_UPDATE = re.compile(
    rf"^\s*UPDATE\s+({_ID})\s+SET\s+(.*)$", re.I | re.S
)
_MERGE = re.compile(
    rf"^\s*MERGE\s+INTO\s+({_ID})\s+USING\s+(.*?)\s+(?:AS\s+)?({_ID})\s+"
    rf"ON\s+\1\s*\.\s*({_ID})\s*=\s*\3\s*\.\s*\4\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$",
    re.I | re.S,
)
_RENAME = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_ID})\s+RENAME\s+COLUMN\s+({_ID})\s+TO\s+({_ID})\s*$",
    re.I,
)
_DROP = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_ID})\s+DROP\s+COLUMN\s+({_ID})\s*$", re.I
)
_ADD = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_ID})\s+ADD\s+COLUMN\s+({_ID})\s+([A-Za-z0-9_() ]+?)\s*$",
    re.I,
)
_RESTORE = re.compile(
    rf"^\s*RESTORE\s+TABLE\s+({_ID})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*$",
    re.I,
)
_INSERT = re.compile(
    rf"^\s*INSERT\s+INTO\s+({_ID})\s+(VALUES\s+.*|SELECT\b.*|WITH\b.*)$",
    re.I | re.S,
)
# Delta's atomic-slice-overwrite SQL: INSERT INTO t REPLACE WHERE
# <range> VALUES …|SELECT … — dispatches to TxTable.replace_where
_INSERT_REPLACE = re.compile(
    rf"^\s*INSERT\s+INTO\s+({_ID})\s+REPLACE\s+WHERE\s+(.*?)\s+"
    r"(VALUES\s+.*|SELECT\b.*|WITH\b.*)$",
    re.I | re.S,
)
_CLONE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+({_ID})\s+SHALLOW\s+CLONE\s+({_ID})"
    rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s+LOCATION\s+({_STR})\s*$",
    re.I,
)
_BLOOM = re.compile(
    rf"^\s*CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+({_ID})\s*\(\s*({_ID})\s*\)"
    rf"(?:\s+FPP\s+({_NUM}))?\s*$",
    re.I,
)
_VACUUM = re.compile(
    rf"^\s*VACUUM\s+({_ID})(?:\s+RETAIN\s+({_NUM})\s+SECONDS)?"
    r"(\s+DRY\s+RUN)?\s*$",
    re.I,
)
# OPTIMIZE t [ZORDER BY (c1[, c2...]) | CLUSTER BY (c)] — the public
# formats' compaction statement, dispatching to TxTable.optimize
_OPTIMIZE = re.compile(
    rf"^\s*OPTIMIZE\s+({_ID})"
    rf"(?:\s+ZORDER\s+BY\s+\(\s*({_ID}(?:\s*,\s*{_ID})*)\s*\)"
    rf"|\s+CLUSTER\s+BY\s+\(\s*({_ID})\s*\))?\s*$",
    re.I,
)
# MAINTAIN t — the policy verb (auto_maintain): execute whatever the
# maintenance gauge advises (optimize / purge_deletes / vacuum)
_MAINTAIN = re.compile(rf"^\s*MAINTAIN\s+({_ID})\s*$", re.I)
# CREATE TABLE t LOCATION 'p' AS SELECT ... — CTAS onto the format;
# the new table auto-registers under its name
_CTAS = re.compile(
    rf"^\s*CREATE\s+TABLE\s+({_ID})\s+LOCATION\s+({_STR})\s+AS\s+"
    r"(SELECT\b.*|WITH\b.*)$",
    re.I | re.S,
)
_DESCRIBE_HISTORY = re.compile(
    rf"^\s*DESCRIBE\s+HISTORY\s+({_ID})\s*$", re.I
)
# ANALYZE TABLE t [EXACT] — one-pass cbo.analyze() over the table's
# current snapshot; stats land in the session's StatsCatalog (an
# in-session dict unless the session was built with a stats_root, in
# which case they persist as JSON) and DESCRIBE STATS t reads them
# back as a relation.
_ANALYZE = re.compile(
    rf"^\s*ANALYZE\s+TABLE\s+({_ID})(\s+EXACT)?\s*$", re.I
)
_DESCRIBE_STATS = re.compile(
    rf"^\s*DESCRIBE\s+STATS\s+({_ID})\s*$", re.I
)
# CREATE MATERIALIZED VIEW mv [LOCATION 'p'] AS
#   SELECT <dim [AS a]>, ..., SUM(<expr>) AS <m> FROM t GROUP BY ...
# — dispatches onto mv.SumCountView (incremental refresh, the cents
# measure convention of the MV family); REFRESH MATERIALIZED VIEW mv
# folds the CDF since the last refresh. SELECTs see the MV under its
# name at its CURRENT (possibly stale) refresh state — refresh is
# explicit, the lakehouse MV convention.
_CREATE_MV = re.compile(
    rf"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+({_ID})\s+"
    rf"(?:LOCATION\s+({_STR})\s+)?AS\s+SELECT\s+(.+?)\s+FROM\s+({_ID})"
    r"\s+GROUP\s+BY\s+(.+?)\s*$",
    re.I | re.S,
)
_REFRESH_MV = re.compile(
    rf"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+({_ID})\s*$", re.I
)
_SUM_ITEM = re.compile(r"^\s*SUM\s*\((.+)\)\s+AS\s+(" + _ID + r")\s*$",
                       re.I | re.S)
_ALIAS_ITEM = re.compile(
    rf"^\s*(.+?)\s+AS\s+({_ID})\s*$", re.I | re.S
)
_BARE_ID = re.compile(rf"^\s*({_ID})\s*$")
_SELECT = re.compile(r"^\s*(SELECT|WITH)\b", re.I)
# SQL time travel inside SELECTs: `FROM t VERSION AS OF n` — rewritten
# to a snapshot view before spark.sql sees the text
_VERSION_AS_OF = re.compile(
    rf"\b({_ID})\s+VERSION\s+AS\s+OF\s+(\d+)", re.I
)


def _lit(text: str):
    if text.startswith("'"):
        return text[1:-1].replace("''", "'")
    return float(text) if "." in text else int(text)


def _parse_range(where: str) -> tuple[str, object, object]:
    m = _W_BETWEEN.match(where)
    if m:
        return m.group(1), _lit(m.group(2)), _lit(m.group(3))
    m = _W_EQ.match(where)
    if m:
        v = _lit(m.group(2))
        return m.group(1), v, v
    raise UnsupportedSqlError(
        f"WHERE {where!r}: only `col BETWEEN lo AND hi` and `col = lit` "
        "are supported — the shapes the stats-pruning index can serve. "
        "Arbitrary predicates belong in a SELECT + explicit rewrite."
    )


def _rsplit_where(text: str) -> tuple[str, str]:
    """Split ``SET … WHERE …`` at the LAST ``WHERE`` that sits outside
    string literals — a SET expression may legitimately contain the
    word inside a quoted string (``SET note = 'x where y' WHERE …``,
    review r8); splitting at the first occurrence spuriously refused
    in-grammar statements."""
    in_q = False
    pos = -1
    up = text.upper()
    for i in range(len(text)):
        ch = text[i]
        if ch == "'":
            in_q = not in_q
        elif not in_q and up.startswith("WHERE", i):
            before = i == 0 or text[i - 1].isspace()
            after = text[i + 5 : i + 6].isspace() or i + 5 == len(text)
            if before and after:
                pos = i
    if pos < 0:
        raise UnsupportedSqlError(
            "UPDATE requires a WHERE clause (full-table updates are a "
            "rewrite job, not a one-liner)"
        )
    return text[:pos].rstrip(), text[pos + 5 :].strip()


def _split_commas(text: str) -> list[str]:
    """Top-level comma split; commas inside parens or string literals
    stay (quote-aware, review r8)."""
    parts: list[str] = []
    depth = 0
    in_q = False
    cur: list[str] = []
    for ch in text:
        if ch == "'":
            in_q = not in_q
        elif not in_q:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        if ch == "," and depth == 0 and not in_q:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _split_assignments(text: str) -> dict[str, str]:
    """``a = expr, b = expr`` → {a: expr}."""
    parts = _split_commas(text)
    out: dict[str, str] = {}
    for p in parts:
        m = re.match(rf"^\s*({_ID})\s*=\s*(.+?)\s*$", p, re.S)
        if not m:
            raise UnsupportedSqlError(f"bad SET assignment: {p!r}")
        out[m.group(1)] = m.group(2)
    return out


class TxSqlSession:
    """SQL statements over registered :class:`TxTable`\\ s (module
    docstring has the grammar). DML/DDL return the committed version;
    SELECT returns a DataFrame over per-call snapshot views."""

    def __init__(self, spark: SparkSession, stats_root: str | None = None):
        self.spark = spark
        self._tables: dict[str, TxTable] = {}
        # name → (SumCountView, exposed measure alias for sum_cents)
        self._mvs: dict[str, tuple] = {}
        # ANALYZE TABLE results; persisted as JSON when stats_root set
        self._stats: dict[str, object] = {}
        if stats_root is not None:
            from .cbo import StatsCatalog

            self._stats_catalog = StatsCatalog(stats_root)
        else:
            self._stats_catalog = None

    def register(self, name: str, table: TxTable) -> "TxSqlSession":
        self._tables[name] = table
        return self

    def _table(self, name: str) -> TxTable:
        try:
            return self._tables[name]
        except KeyError:
            raise UnsupportedSqlError(
                f"unknown table {name!r} (registered: {sorted(self._tables)})"
            ) from None

    def _refresh_views(self) -> None:
        for name, t in self._tables.items():
            t.read().createOrReplaceTempView(name)
        for name, (view, alias) in self._mvs.items():
            view.read().withColumnRenamed(
                "sum_cents", alias
            ).createOrReplaceTempView(name)

    def _rewrite_time_travel(self, text: str) -> str:
        """Rewrite each `t VERSION AS OF n` to a snapshot view
        `__t_v<n>` over read(version=n) — history readable from plain
        SQL (the public formats' TABLE … VERSION AS OF surface).
        Shared by the SELECT and CTAS paths."""

        def _tt(m: "re.Match") -> str:
            name, v = m.group(1), int(m.group(2))
            if name not in self._tables:
                return m.group(0)
            view = f"__{name}_v{v}"
            self._tables[name].read(version=v).createOrReplaceTempView(
                view
            )
            return view

        return _VERSION_AS_OF.sub(_tt, text)

    def _insert_rows(self, t: TxTable, body: str) -> DataFrame:
        """Evaluate an INSERT body (VALUES/SELECT/WITH) and coerce it to
        the table schema: arity checked loudly, then ANSI
        store-assignment positional casts (a bad value errors at
        runtime under ANSI, never silently)."""
        self._refresh_views()  # SELECT sources may read registered tables
        if body.upper().startswith("VALUES"):
            cols = ", ".join(t.read().columns)
            body = f"SELECT * FROM ({body}) AS __v({cols})"
        rows = self.spark.sql(body)
        schema = t.read().schema
        if len(rows.columns) != len(schema.fields):
            raise UnsupportedSqlError(
                f"INSERT arity {len(rows.columns)} != table arity "
                f"{len(schema.fields)}"
            )
        return rows.select(
            *[
                rows[c].cast(f.dataType).alias(f.name)
                for c, f in zip(rows.columns, schema.fields)
            ]
        )

    def sql(self, text: str):
        text = text.strip().rstrip(";")
        m = _DELETE.match(text)
        if m:
            col, lo, hi = _parse_range(m.group(2))
            return self._table(m.group(1)).delete_where(col, lo, hi)
        m = _UPDATE.match(text)
        if m:
            set_part, where_part = _rsplit_where(m.group(2))
            col, lo, hi = _parse_range(where_part)
            return self._table(m.group(1)).update_where(
                col, lo, hi, _split_assignments(set_part)
            )
        m = _MERGE.match(text)
        if m:
            name, source_sql, _alias, key = (
                m.group(1),
                m.group(2),
                m.group(3),
                m.group(4),
            )
            self._refresh_views()  # source may SELECT from registered tables
            src = source_sql.strip()
            if src.startswith("(") and src.endswith(")"):
                src = src[1:-1]
            updates = self.spark.sql(src)
            return self._table(name).merge_upsert(updates, key)
        m = _RENAME.match(text)
        if m:
            return self._table(m.group(1)).alter_rename_column(
                m.group(2), m.group(3)
            )
        m = _DROP.match(text)
        if m:
            return self._table(m.group(1)).alter_drop_column(m.group(2))
        m = _ADD.match(text)
        if m:
            return self._table(m.group(1)).alter_add_column(
                m.group(2), m.group(3)
            )
        m = _RESTORE.match(text)
        if m:
            return self._table(m.group(1)).restore(int(m.group(2)))
        m = _CLONE.match(text)
        if m:
            name, src, ver, loc = m.groups()
            clone = self._table(src).clone_to(
                loc[1:-1].replace("''", "'"),
                version=int(ver) if ver is not None else None,
            )
            self.register(name, clone)
            return clone
        m = _BLOOM.match(text)
        if m:
            name, col, fpp = m.groups()
            return self._table(name).build_bloom_index(
                col, fpp=float(fpp) if fpp is not None else 0.01
            )
        m = _VACUUM.match(text)
        if m:
            name, retain, dry = m.groups()
            return self._table(name).vacuum(
                retention_sec=float(retain) if retain is not None else 3600.0,
                dry_run=dry is not None,
            )
        m = _CREATE_MV.match(text)
        if m:
            name, loc, select_list, src_name, group_by = m.groups()
            if name in self._tables or name in self._mvs:
                raise UnsupportedSqlError(
                    f"name {name!r} is already registered"
                )
            src = self._table(src_name)
            dims: dict[str, str] = {}
            measure: tuple[str, str] | None = None
            for item in _split_commas(select_list):
                ms = _SUM_ITEM.match(item)
                if ms:
                    if measure is not None:
                        raise UnsupportedSqlError(
                            "exactly one SUM(...) measure is supported"
                        )
                    measure = (ms.group(1).strip(), ms.group(2))
                    continue
                ma = _ALIAS_ITEM.match(item)
                if ma:
                    dims[ma.group(2)] = ma.group(1).strip()
                    continue
                mb = _BARE_ID.match(item)
                if mb:
                    dims[mb.group(1)] = mb.group(1)
                    continue
                raise UnsupportedSqlError(
                    f"MV select item needs an alias: {item.strip()!r}"
                )
            if measure is None:
                raise UnsupportedSqlError(
                    "MV needs a SUM(<expr>) AS <name> measure (maintained "
                    "as integer cents — the MV family convention)"
                )
            if not dims:
                raise UnsupportedSqlError("MV needs at least one dimension")
            if measure[1] == "n_rows" or measure[1] in dims:
                raise UnsupportedSqlError(
                    f"measure alias {measure[1]!r} collides with a dim "
                    "or the implicit n_rows count"
                )
            n_group = len(_split_commas(group_by))
            if n_group != len(dims):
                raise UnsupportedSqlError(
                    f"GROUP BY lists {n_group} items but the select list "
                    f"has {len(dims)} dimensions"
                )
            from .mv import SumCountView, view_root

            root = (
                loc[1:-1].replace("''", "'")
                if loc
                else view_root(src.root, name)
            )
            view = SumCountView.create(
                self.spark, src, root, name, dims, measure[0]
            )
            view.refresh()  # CREATE materializes at the current source
            self._mvs[name] = (view, measure[1])
            return view
        m = _REFRESH_MV.match(text)
        if m:
            name = m.group(1)
            if name not in self._mvs:
                raise UnsupportedSqlError(
                    f"unknown materialized view {name!r} "
                    f"(registered: {sorted(self._mvs)})"
                )
            return self._mvs[name][0].refresh()
        m = _CTAS.match(text)
        if m:
            name, loc, sel = m.groups()
            if name in self._tables:
                raise UnsupportedSqlError(
                    f"table {name!r} is already registered"
                )
            self._refresh_views()
            # the CTAS body takes the same time-travel rewrite as a
            # plain SELECT — `CREATE TABLE … AS SELECT … VERSION AS OF
            # n` must work wherever the bare SELECT does
            df = self.spark.sql(self._rewrite_time_travel(sel))
            t = TxTable.create(
                self.spark, loc[1:-1].replace("''", "'"), df
            )
            self.register(name, t)
            return t
        m = _OPTIMIZE.match(text)
        if m:
            name, zcols, ccol = m.groups()
            kw = {}
            if zcols:
                kw["zorder_by"] = [c.strip() for c in zcols.split(",")]
            elif ccol:
                kw["cluster_by"] = ccol
            return self._table(name).optimize(**kw)
        m = _MAINTAIN.match(text)
        if m:
            return self._table(m.group(1)).auto_maintain()
        m = _DESCRIBE_HISTORY.match(text)
        if m:
            return self._table(m.group(1)).history_df()
        m = _ANALYZE.match(text)
        if m:
            from .cbo import analyze

            name = m.group(1)
            stats = analyze(
                self._table(name).read(), exact=m.group(2) is not None
            )
            self._stats[name] = stats
            if self._stats_catalog is not None:
                self._stats_catalog.put(name, stats)
            return stats
        m = _DESCRIBE_STATS.match(text)
        if m:
            name = m.group(1)
            stats = self._stats.get(name)
            if stats is None and self._stats_catalog is not None:
                stats = self._stats_catalog.get(name)
            if stats is None:
                raise UnsupportedSqlError(
                    f"no statistics for {name!r} — run ANALYZE TABLE "
                    f"{name} first"
                )
            rows = [
                (
                    c,
                    stats.row_count,
                    stats.ndv[c],
                    stats.null_count[c],
                    float(stats.avg_col_bytes[c]),
                )
                for c in sorted(stats.ndv)
            ]
            return local_frame(
                self.spark,
                rows,
                "col string, row_count bigint, ndv bigint, "
                "null_count bigint, avg_col_bytes double",
            )
        m = _INSERT_REPLACE.match(text)
        if m:
            t = self._table(m.group(1))
            col, lo, hi = _parse_range(m.group(2))
            return t.replace_where(
                col, lo, hi, self._insert_rows(t, m.group(3).strip())
            )
        m = _INSERT.match(text)
        if m:
            t = self._table(m.group(1))
            return t.append(self._insert_rows(t, m.group(2).strip()))
        if _SELECT.match(text):
            self._refresh_views()
            return self.spark.sql(self._rewrite_time_travel(text))
        raise UnsupportedSqlError(
            f"unsupported statement: {text[:80]!r}… — supported: SELECT/"
            "WITH, INSERT INTO t [REPLACE WHERE <range>] VALUES …|SELECT "
            "…, DELETE FROM t WHERE "
            "<range>, UPDATE t SET … WHERE <range>, MERGE INTO t USING "
            "<src> s ON t.k = s.k WHEN MATCHED THEN UPDATE SET * WHEN "
            "NOT MATCHED THEN INSERT *, ALTER TABLE t RENAME/DROP/ADD "
            "COLUMN, RESTORE TABLE t TO VERSION AS OF n, CREATE TABLE "
            "t2 SHALLOW CLONE t [VERSION AS OF n] LOCATION 'path', "
            "CREATE BLOOMFILTER INDEX ON t (col) [FPP p], "
            "VACUUM t [RETAIN n SECONDS] [DRY RUN], "
            "OPTIMIZE t [ZORDER BY (c1, c2) | CLUSTER BY (c)], "
            "MAINTAIN t, DESCRIBE HISTORY t, "
            "CREATE TABLE t LOCATION 'path' AS SELECT …, "
            "CREATE MATERIALIZED VIEW mv [LOCATION 'path'] AS SELECT "
            "dims…, SUM(expr) AS m FROM t GROUP BY dims…, "
            "REFRESH MATERIALIZED VIEW mv, ANALYZE TABLE t [EXACT], "
            "DESCRIBE STATS t"
        )
