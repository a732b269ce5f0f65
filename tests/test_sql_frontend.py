"""SQL front-end parity: for dialect-portable queries, the ANSI oracle
string itself runs verbatim through spark.sql() over registered views
and returns exactly what the DataFrame implementation returns.

This is the dual-API guarantee an engine owes its users: declare the
query in SQL or in the DataFrame API, get the same relation (and the
same Catalyst planning). Only oracles free of DuckDB-isms (list_*,
regexp_split_to_array, isodow, string_agg, ::, TRY_CAST-on-json) are
eligible; the registry-wide value check remains tests/test_oracle_parity.
"""

from __future__ import annotations

import pytest

import data_mastery_pipeline_spark.queries  # noqa: F401
import data_mastery_pipeline_spark.queries_adv  # noqa: F401
import data_mastery_pipeline_spark.queries_ops  # noqa: F401
import data_mastery_pipeline_spark.queries_tpch  # noqa: F401
from data_mastery_pipeline_spark.registry import ORACLE, QUERIES
from data_mastery_pipeline_spark.tables import TABLE_NAMES, load_table

from conftest import SF_SMOKE

# Oracles verified dialect-portable (plain ANSI): these run unchanged on
# both DuckDB and Spark SQL.
PORTABLE = [
    "pricing_summary",
    "forecast_revenue_change",
    "late_order_priorities",
    "local_supplier_volume",
    "national_market_share",
    "product_profit_by_nation",
    "important_part_values",
    "supplier_part_variety",
    "dominant_part_suppliers",
    "snapshot_diff",
]


@pytest.fixture(scope="module")
def sql_views(spark):
    for t in TABLE_NAMES:
        load_table(spark, t, SF_SMOKE).createOrReplaceTempView(t)
    return spark


def _norm(v):
    # Spark SQL types numeric literals as DECIMAL (100.0 → decimal(4,1))
    # where the DataFrame API used doubles — same values, different type
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return round(v, 6)
    return v


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_string_matches_dataframe_api(name, sql_views, spark):
    sql_df = spark.sql(ORACLE[name])
    api_df = QUERIES[name](spark, SF_SMOKE)
    assert sorted(sql_df.columns) == sorted(api_df.columns)
    cols = sorted(sql_df.columns)
    got = sorted(tuple(_norm(v) for v in r) for r in sql_df.select(*cols).collect())
    want = sorted(tuple(_norm(v) for v in r) for r in api_df.select(*cols).collect())
    assert got == want


# ---------------------------------------------------------------------------
# SQL DML over the table format (txsql.TxSqlSession, r8): the reverse
# direction — SQL statements DRIVING the txlog verbs. The guarantee:
# the same op sequence through SQL and through the DataFrame API lands
# on the same commit paths and produces IDENTICAL table states.
# ---------------------------------------------------------------------------


def _mk_pair(spark, tmp_path):
    from data_mastery_pipeline_spark.sources.txlog import TxTable

    rows = [(i, "g%d" % (i % 3), float(i)) for i in range(12)]
    ddl = "id long, grp string, v double"
    a = TxTable.create(spark, str(tmp_path / "sql_t"),
                       spark.createDataFrame(rows, ddl))
    b = TxTable.create(spark, str(tmp_path / "api_t"),
                       spark.createDataFrame(rows, ddl))
    return a, b


def _state(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_sql_dml_matches_dataframe_dml(spark, tmp_path):
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, api_t = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)

    ss.sql("DELETE FROM t WHERE v BETWEEN 2 AND 3")
    api_t.delete_where("v", 2, 3)
    assert _state(sql_t) == _state(api_t)

    ss.sql("UPDATE t SET v = v + 100, grp = upper(grp) WHERE v BETWEEN 5 AND 7")
    api_t.update_where("v", 5, 7, {"v": "v + 100", "grp": "upper(grp)"})
    assert _state(sql_t) == _state(api_t)

    ss.sql(
        "MERGE INTO t USING (SELECT id, 'm' AS grp, v * 2 AS v FROM t "
        "WHERE id >= 10) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    api_t.merge_upsert(
        api_t.read().filter("id >= 10").selectExpr("id", "'m' AS grp", "v * 2 AS v"),
        "id",
    )
    assert _state(sql_t) == _state(api_t)

    ss.sql("ALTER TABLE t RENAME COLUMN v TO amount")
    api_t.alter_rename_column("v", "amount")
    assert _state(sql_t) == _state(api_t)
    assert "amount" in sql_t.read().columns

    ss.sql("DELETE FROM t WHERE grp = 'm'")
    api_t.delete_where("grp", "m", "m")
    assert _state(sql_t) == _state(api_t)

    ss.sql("RESTORE TABLE t TO VERSION AS OF 1")
    api_t.restore(1)
    assert _state(sql_t) == _state(api_t)

    # SELECT runs real spark.sql over the registered snapshot
    out = ss.sql("SELECT grp, count(*) AS n FROM t GROUP BY grp ORDER BY grp")
    want = sorted(
        (r["grp"], r["n"])
        for r in api_t.read().groupBy("grp").count()
        .withColumnRenamed("count", "n").collect()
    )
    assert sorted((r["grp"], r["n"]) for r in out.collect()) == want


def test_sql_dml_refusals_are_loud(spark, tmp_path):
    from data_mastery_pipeline_spark.txsql import TxSqlSession, UnsupportedSqlError

    sql_t, _ = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    with pytest.raises(UnsupportedSqlError, match="BETWEEN"):
        ss.sql("DELETE FROM t WHERE v > 3 OR grp = 'a'")
    with pytest.raises(UnsupportedSqlError, match="unknown table"):
        ss.sql("DELETE FROM nope WHERE v = 1")
    with pytest.raises(UnsupportedSqlError, match="unsupported statement"):
        ss.sql("TRUNCATE TABLE t")


def test_sql_update_with_quoted_where_in_set(spark, tmp_path):
    """A SET expression containing the word 'where' inside a string
    literal must parse (review r8: the split is quote-aware and takes
    the LAST unquoted WHERE)."""
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, api_t = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    ss.sql(
        "UPDATE t SET grp = 'x, where (y' WHERE v BETWEEN 1 AND 2"
    )
    api_t.update_where("v", 1, 2, {"grp": "'x, where (y'"})
    assert _state(sql_t) == _state(api_t)


def test_sql_insert_values_and_select(spark, tmp_path):
    from data_mastery_pipeline_spark.txsql import TxSqlSession, UnsupportedSqlError

    sql_t, api_t = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    # VALUES form: positional, ANSI store-assignment casts (int → long,
    # decimal literal → double)
    ss.sql("INSERT INTO t VALUES (100, 'z', 1.5), (101, 'z', 2.5)")
    api_t.append(
        spark.createDataFrame(
            [(100, "z", 1.5), (101, "z", 2.5)], "id long, grp string, v double"
        )
    )
    assert _state(sql_t) == _state(api_t)
    # SELECT form (may read the registered tables themselves)
    ss.sql("INSERT INTO t SELECT id + 500, grp, v FROM t WHERE id >= 100")
    api_t.append(
        api_t.read()
        .filter("id >= 100")
        .selectExpr("id + 500 AS id", "grp", "v")
    )
    assert _state(sql_t) == _state(api_t)
    with pytest.raises(UnsupportedSqlError, match="arity"):
        ss.sql("INSERT INTO t SELECT 1, 'a'")


def test_sql_insert_replace_where_matches_dataframe(spark, tmp_path):
    """INSERT INTO t REPLACE WHERE <range> … dispatches to
    replace_where: SQL and DataFrame paths produce identical states,
    re-running the same statement is idempotent, and out-of-slice rows
    refuse."""
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, api_t = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    stmt = (
        "INSERT INTO t REPLACE WHERE v BETWEEN 1 AND 3 "
        "VALUES (200, 'r', 1.5), (201, 'r', 2.5)"
    )
    ss.sql(stmt)
    api_t.replace_where(
        "v",
        1,
        3,
        spark.createDataFrame(
            [(200, "r", 1.5), (201, "r", 2.5)], "id long, grp string, v double"
        ),
    )
    assert _state(sql_t) == _state(api_t)
    ss.sql(stmt)  # idempotent re-load
    api_t.replace_where(
        "v",
        1,
        3,
        spark.createDataFrame(
            [(200, "r", 1.5), (201, "r", 2.5)], "id long, grp string, v double"
        ),
    )
    assert _state(sql_t) == _state(api_t)
    with pytest.raises(Exception, match="outside"):
        ss.sql(
            "INSERT INTO t REPLACE WHERE v BETWEEN 1 AND 3 "
            "VALUES (300, 'x', 50.0)"
        )


def test_sql_time_travel_version_as_of(spark, tmp_path):
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, api_t = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    ss.sql("DELETE FROM t WHERE v BETWEEN 0 AND 5")
    # v0 still fully readable from SQL; head reflects the delete
    n0 = ss.sql("SELECT count(*) AS n FROM t VERSION AS OF 0").first()["n"]
    n_head = ss.sql("SELECT count(*) AS n FROM t").first()["n"]
    assert n0 == 12 and n_head == 6
    # joins between versions work (snapshot views are real relations)
    gone = ss.sql(
        "SELECT count(*) AS n FROM t VERSION AS OF 0 o "
        "LEFT ANTI JOIN t cur ON o.id = cur.id"
    ).first()["n"]
    assert gone == 6


def test_sql_shallow_clone_and_bloom_index(spark, tmp_path):
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, api_t = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    dest = str(tmp_path / "sql_clone")
    ss.sql(f"CREATE TABLE t2 SHALLOW CLONE t LOCATION '{dest}'")
    # the clone registers and serves SQL immediately; divergence holds
    ss.sql("DELETE FROM t2 WHERE v BETWEEN 0 AND 5")
    assert ss.sql("SELECT count(*) AS n FROM t").first()["n"] == 12
    assert ss.sql("SELECT count(*) AS n FROM t2").first()["n"] == 6
    # API equivalence: clone_to at the same version reads identically
    api_clone = api_t.clone_to(str(tmp_path / "api_clone"))
    api_clone.delete_where("v", 0.0, 5.0)
    assert _state(ss._table("t2")) == _state(api_clone)
    # bloom index via SQL: equality scan prunes like the API build
    ss.sql("CREATE BLOOMFILTER INDEX ON t2 (id) FPP 0.001")
    df, st = ss._table("t2").scan({"id": (10, 10)})
    assert df.count() == 1
    api_clone.build_bloom_index("id", fpp=0.001)
    df2, st2 = api_clone.scan({"id": (10, 10)})
    assert st["files_bloom_pruned"] == st2["files_bloom_pruned"]


def test_sql_clone_version_as_of_and_refusals(spark, tmp_path):
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, _ = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    ss.sql("DELETE FROM t WHERE v BETWEEN 0 AND 5")
    dest = str(tmp_path / "v0_clone")
    ss.sql(f"CREATE TABLE t0 SHALLOW CLONE t VERSION AS OF 0 LOCATION '{dest}'")
    assert ss.sql("SELECT count(*) AS n FROM t0").first()["n"] == 12
    from data_mastery_pipeline_spark.txsql import UnsupportedSqlError as _E

    with pytest.raises(_E):
        ss.sql("CREATE TABLE x DEEP CLONE t LOCATION '/tmp/nope'")


def test_sql_vacuum_dry_run_and_real(spark, tmp_path):
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, _ = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    ss.sql("DELETE FROM t WHERE v BETWEEN 0 AND 100")  # orphans files
    would = ss.sql("VACUUM t RETAIN 0 SECONDS DRY RUN")
    assert would  # the delete orphaned at least one file
    import os as _os

    root = sql_t.root
    for rel in would:
        assert _os.path.exists(_os.path.join(root, rel))  # dry: untouched
    real = ss.sql("VACUUM t RETAIN 0 SECONDS")
    assert real == would
    for rel in real:
        assert not _os.path.exists(_os.path.join(root, rel))


def test_sql_optimize_maintain_describe_history(spark, tmp_path):
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, api_t = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    ddl = "id long, grp string, v double"
    for t in (sql_t, api_t):  # debt: tiny appends + a DV delete
        for i in range(3):
            t.append(
                spark.createDataFrame([(100 + i, "x", float(i))], ddl)
            )
        t.delete_where("id", 100, 100, mode="dv")

    ss.sql("OPTIMIZE t")
    api_t.optimize()
    assert _state(sql_t) == _state(api_t)

    report = ss.sql("MAINTAIN t")
    assert isinstance(report, dict) and "executed" in report
    assert sum(sql_t.dv_stats().values()) == 0  # purge ran via policy
    assert _state(sql_t) == _state(api_t)

    hist = ss.sql("DESCRIBE HISTORY t")
    ops = [r["op"] for r in hist.collect()]
    assert "optimize" in ops and ops.count("append") >= 3

    before = _state(sql_t)
    ss.sql("OPTIMIZE t ZORDER BY (id, v)")  # parses, commits, no-loss
    assert _state(sql_t) == before


def test_sql_ctas_creates_and_registers(spark, tmp_path):
    from data_mastery_pipeline_spark.txsql import (
        TxSqlSession,
        UnsupportedSqlError,
    )

    sql_t, _ = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    loc = str(tmp_path / "ctas_t")
    t2 = ss.sql(
        f"CREATE TABLE t2 LOCATION '{loc}' AS "
        "SELECT grp, count(*) AS n FROM t GROUP BY grp"
    )
    # the new table is a real TxTable, auto-registered and queryable
    out = ss.sql("SELECT grp, n FROM t2 ORDER BY grp")
    want = sorted(
        (r["grp"], r["n"])
        for r in sql_t.read().groupBy("grp").count()
        .withColumnRenamed("count", "n").collect()
    )
    assert sorted((r["grp"], r["n"]) for r in out.collect()) == want
    assert t2.version() == 0
    # DML works on the CTAS result (it is a full table, not a view)
    ss.sql("DELETE FROM t2 WHERE grp = 'g0'")
    assert all(r["grp"] != "g0" for r in t2.read().collect())
    # duplicate registration refuses
    import pytest as _pytest

    with _pytest.raises(UnsupportedSqlError):
        ss.sql(f"CREATE TABLE t2 LOCATION '{loc}2' AS SELECT 1 AS x")


def test_sql_ctas_with_time_travel(spark, tmp_path):
    """CREATE TABLE … AS SELECT … VERSION AS OF n must take the same
    time-travel rewrite as a plain SELECT (it used to hit spark.sql
    unrewritten and die on the parser)."""
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, _ = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    ss.sql("DELETE FROM t WHERE id BETWEEN 0 AND 8")  # v1 shrinks t
    # the bare SELECT works — the CTAS of the SAME body must too
    v0 = ss.sql("SELECT count(*) AS n FROM t VERSION AS OF 0").collect()
    assert v0[0]["n"] == 12
    t2 = ss.sql(
        f"CREATE TABLE t_v0 LOCATION '{tmp_path / 'ctas_tt'}' AS "
        "SELECT id, grp, v FROM t VERSION AS OF 0"
    )
    assert t2.read().count() == 12  # the pre-delete snapshot
    assert sql_t.read().count() == 3  # live table unchanged


def test_sql_materialized_view_matches_dataframe_api(spark, tmp_path):
    from pyspark.sql import functions as F

    """CREATE/REFRESH MATERIALIZED VIEW dispatch onto mv.SumCountView —
    the SQL MV and an API-built view over an identical source, driven
    through the same DML, must hold identical state at every step (the
    DML-verbs equality discipline applied to the MV family)."""
    from data_mastery_pipeline_spark.mv import SumCountView, view_root
    from data_mastery_pipeline_spark.txsql import (
        TxSqlSession,
        UnsupportedSqlError,
    )

    sql_t, api_t = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    ss.sql(
        "CREATE MATERIALIZED VIEW grp_mv AS "
        "SELECT grp, SUM(v) AS v_cents FROM t GROUP BY grp"
    )
    api_view = SumCountView.create(
        spark, api_t, view_root(api_t.root, "grp_mv"), "grp_mv",
        {"grp": "grp"}, "v",
    )
    api_view.refresh()

    def _mv_state_sql():
        return sorted(
            (r["grp"], r["n_rows"], r["v_cents"])
            for r in ss.sql(
                "SELECT grp, n_rows, v_cents FROM grp_mv"
            ).collect()
        )

    def _mv_state_api():
        return sorted(
            (r["grp"], r["n_rows"], r["sum_cents"])
            for r in api_view.read().collect()
        )

    # CREATE materializes immediately
    assert _mv_state_sql() == _mv_state_api()
    assert len(_mv_state_sql()) == 3

    # DML on the source; SQL MV is STALE until explicit refresh
    before = _mv_state_sql()
    ss.sql("DELETE FROM t WHERE v BETWEEN 0 AND 3")
    api_t.delete_where("v", 0, 3)
    assert _mv_state_sql() == before  # stale by design
    ss.sql("REFRESH MATERIALIZED VIEW grp_mv")
    api_view.refresh()
    assert _mv_state_sql() == _mv_state_api()

    ss.sql("UPDATE t SET v = v + 100 WHERE v BETWEEN 6 AND 9")
    api_t.update_where("v", 6, 9, {"v": F.col("v") + 100})
    ss.sql("REFRESH MATERIALIZED VIEW grp_mv")
    api_view.refresh()
    assert _mv_state_sql() == _mv_state_api()
    # refresh with nothing new is a no-op (returns None)
    assert ss.sql("REFRESH MATERIALIZED VIEW grp_mv") is None

    # grammar guards
    import pytest as _pytest

    with _pytest.raises(UnsupportedSqlError):
        ss.sql("REFRESH MATERIALIZED VIEW nope")
    with _pytest.raises(UnsupportedSqlError):
        ss.sql(
            "CREATE MATERIALIZED VIEW grp_mv AS "
            "SELECT grp, SUM(v) AS c FROM t GROUP BY grp"
        )  # duplicate name
    with _pytest.raises(UnsupportedSqlError):
        ss.sql(
            "CREATE MATERIALIZED VIEW m2 AS "
            "SELECT grp FROM t GROUP BY grp"
        )  # no measure


def test_sql_mv_expression_dims_and_location(spark, tmp_path):
    from pyspark.sql import functions as F

    """Expression dims (CASE ... AS alias) and explicit LOCATION."""
    from data_mastery_pipeline_spark.txsql import TxSqlSession

    sql_t, _ = _mk_pair(spark, tmp_path)
    ss = TxSqlSession(spark).register("t", sql_t)
    loc = str(tmp_path / "mv_loc")
    ss.sql(
        f"CREATE MATERIALIZED VIEW band_mv LOCATION '{loc}' AS "
        "SELECT CASE WHEN v < 6 THEN 'lo' ELSE 'hi' END AS band, "
        "SUM(v) AS v_cents FROM t GROUP BY band"
    )
    import os

    assert os.path.isdir(loc)
    got = sorted(
        (r["band"], r["n_rows"], r["v_cents"])
        for r in ss.sql("SELECT * FROM band_mv").collect()
    )
    want = sorted(
        (r["band"], r["n"], r["c"])
        for r in sql_t.read()
        .groupBy(
            F.when(F.col("v") < 6, "lo").otherwise("hi").alias("band")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("v") * 100 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("c"),
        )
        .collect()
    )
    assert got == want


def test_sql_analyze_and_describe_stats(spark, tmp_path):
    """ANALYZE TABLE → cbo.analyze over the snapshot; DESCRIBE STATS
    reads it back as a relation; stats persist to the StatsCatalog
    when the session carries a stats_root."""
    from data_mastery_pipeline_spark.cbo import StatsCatalog
    from data_mastery_pipeline_spark.txsql import (
        TxSqlSession,
        UnsupportedSqlError,
    )

    sql_t, _ = _mk_pair(spark, tmp_path)
    root = str(tmp_path / "stats")
    ss = TxSqlSession(spark, stats_root=root).register("t", sql_t)
    with pytest.raises(UnsupportedSqlError):
        ss.sql("DESCRIBE STATS t")  # nothing analyzed yet
    stats = ss.sql("ANALYZE TABLE t EXACT")
    assert stats.row_count == 12
    got = {r["col"]: r for r in ss.sql("DESCRIBE STATS t").collect()}
    assert got["id"]["ndv"] == 12 and got["grp"]["ndv"] == 3
    assert got["id"]["null_count"] == 0
    assert all(r["row_count"] == 12 for r in got.values())
    # persisted: a fresh catalog on the same root sees it
    assert StatsCatalog(root).get("t").ndv["grp"] == 3
    # stats reflect the snapshot at ANALYZE time, not live state
    ss.sql("DELETE FROM t WHERE id BETWEEN 0 AND 5")
    assert ss.sql("DESCRIBE STATS t").collect()[0]["row_count"] == 12
    ss.sql("ANALYZE TABLE t EXACT")
    assert ss.sql("DESCRIBE STATS t").collect()[0]["row_count"] == 6
