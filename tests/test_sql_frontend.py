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
