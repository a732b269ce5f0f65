"""Cross-engine Unicode contracts (review r6).

Spark's ``levenshtein`` counts CODEPOINTS; DuckDB's counts BYTES
(levenshtein('的是在','的是了') = 1 vs 3).  edit_near_dups_lsh gates
to ASCII heads (char length == byte length) on BOTH engines — the only
regime where the two metrics coincide.  This test runs the REGISTERED
query function and its REGISTERED oracle SQL over a fixture that
contains a CJK near-dup pair (codepoint distance 3, byte distance 9):
without the gate the engines disagree on that pair; with it, parity is
exact and the ASCII pair still surfaces.
"""

from __future__ import annotations

import duckdb
import pytest

import data_mastery_pipeline_spark.queries_ext  # noqa: F401 — registers
from data_mastery_pipeline_spark.registry import ORACLE, QUERIES


@pytest.fixture(scope="module")
def cjk_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cjk_docs")
    rows = [
        # ASCII near-dup pair: heads differ by 2 substitutions
        (1, "hello world alpha beta gamma delta", "en", "web", 34),
        (2, "hello world alpha beta gamma delft", "en", "web", 34),
        # CJK near-dup pair: 40-char heads differing in 3 codepoints
        # (= 9 bytes).  Spark levenshtein = 3 (would emit), DuckDB = 9
        # (would filter) — parity is impossible without the ASCII gate.
        (3, "的是在了和" * 8, "zh", "web", 40),
        (4, "的是在了和" * 7 + "的是在金木水", "zh", "web", 40),
        # lone ASCII doc, no partner within distance 8
        (5, "completely different text that matches nothing", "en", "web", 47),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_edit_lsh_ascii_gate_parity(spark, cjk_docs_dir):
    sdf = QUERIES["edit_near_dups_lsh"](spark, cjk_docs_dir)
    srows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{cjk_docs_dir}/documents.parquet/*.parquet'"
    )
    orows = sorted(con.sql(ORACLE["edit_near_dups_lsh"]).fetchall())

    assert srows == orows, (srows, orows)
    # the ASCII pair surfaces with its true distance; the CJK pair is
    # gated out on both sides (not emitted with DIFFERENT distances)
    assert (1, 2, 2) in srows
    assert not any(r[0] == 3 or r[1] == 4 for r in srows)


def test_cjk_levenshtein_divergence_is_real():
    """Pin the engine divergence the gate exists for — if DuckDB ever
    switches to codepoint semantics, this fails and the gate (plus its
    docstring) should be revisited."""
    assert duckdb.sql("select levenshtein('的是在','的是了')").fetchone()[0] == 3


def test_spark_levenshtein_counts_codepoints(spark):
    row = spark.sql("select levenshtein('的是在','的是了') as d").first()
    assert row["d"] == 1


def test_exact_dedup_null_text_docs_all_survive(spark):
    """Review r6 (8th pass): NULL-text docs share a NULL fingerprint —
    window partitioning groups NULL keys like GROUP BY, so without the
    guard all-but-one DISTINCT no-text documents were silently deleted."""
    from data_mastery_pipeline_spark.dedup import exact as dedup_exact

    rows = [
        (1, "same text here", "en", "web", 14),
        (2, "same text here", "en", "web", 14),   # true duplicate of 1
        (3, None, "en", "web", 0),
        (4, None, "en", "web", 0),                 # NOT a duplicate of 3
        (5, None, "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    kept = sorted(r["doc_id"] for r in dedup_exact.exact_dedup(df).collect())
    assert kept == [1, 3, 4, 5]
    stats = dedup_exact.dup_stats(df).collect()
    assert len(stats) == 1 and stats[0]["n_copies"] == 2  # only the real group
