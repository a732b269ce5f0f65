"""Schema-drift detection (SURVEY §1.3): the registry is enforced on
read, and divergence between stored and declared schemas is loud."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark import schemas, tables

from conftest import SF_ORACLE


def test_all_testdata_tables_match_registry(spark):
    for name in tables.TABLE_NAMES:
        tables.check_drift(spark, name, SF_ORACLE)  # must not raise


def test_missing_column_detected(spark):
    df = tables.load_table(spark, "orders", SF_ORACLE).drop("o_totalprice")
    with pytest.raises(schemas.SchemaDriftError, match="missing=\\['o_totalprice'\\]"):
        schemas.assert_schema(df, schemas.ORDERS)


def test_extra_column_detected(spark):
    df = tables.load_table(spark, "orders", SF_ORACLE).withColumn("surprise", F.lit(1))
    with pytest.raises(schemas.SchemaDriftError, match="extra=\\['surprise'\\]"):
        schemas.assert_schema(df, schemas.ORDERS)


def test_type_change_detected(spark):
    df = tables.load_table(spark, "orders", SF_ORACLE).withColumn(
        "o_totalprice", F.col("o_totalprice").cast("string")
    )
    with pytest.raises(schemas.SchemaDriftError, match="changed="):
        schemas.assert_schema(df, schemas.ORDERS)


def test_matching_schema_passes_through(spark):
    df = tables.load_table(spark, "orders", SF_ORACLE)
    assert schemas.assert_schema(df, schemas.ORDERS) is df
