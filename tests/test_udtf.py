"""Python UDTF surface (SURVEY §2.K): the lateral-join table function
emits exactly the rows the Catalyst chunker builds."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_mastery_pipeline_spark.functions import text as textfn
from data_mastery_pipeline_spark.functions.udtfs import register_udtfs
from data_mastery_pipeline_spark.tables import load_table

from conftest import SF_SMOKE


def test_chunk_udtf_matches_catalyst_chunker(spark):
    register_udtfs(spark)
    docs = load_table(spark, "documents", SF_SMOKE).select("doc_id", "text")
    # edge cases the Python path historically diverged on: empty text,
    # whitespace-only text, Unicode NBSP (Java \s does NOT match it)
    edge = spark.createDataFrame(
        [(90001, ""), (90002, "   "), (90003, "a b c"), (90004, "\tx y"), (90005, "a\u00a0b c")],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    docs.createOrReplaceTempView("udtf_docs")

    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_chunk_tokens
        FROM udtf_docs d, LATERAL chunk_docs(d.text) c
        """
    )
    native = docs.select(
        "doc_id",
        F.explode(textfn.chunk_spans("text", chunk_size=50, overlap=10)).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.chunk_text", "c.n_chunk_tokens")

    got = {tuple(r) for r in via_udtf.collect()}
    want = {tuple(r) for r in native.collect()}
    assert got == want and got
    # multi-chunk docs exist (the lateral join genuinely expands)
    assert len(got) > docs.count()
