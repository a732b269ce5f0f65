"""dedup/editjoin.py: ED-Join prefix-filtered edit-distance join must
equal the brute blocked join EXACTLY — including the short-string
fallback path the prefix theorem doesn't cover, boundary distances
(d == k), and cross-block exclusion."""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.dedup import editjoin

SCHEMA = "doc_id long, lang string, head string"


def _brute(spark, rows, k=8):
    df = spark.createDataFrame(rows, SCHEMA)
    a = df.select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("la"),
        F.col("head").alias("sa"),
    )
    b = df.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lb"),
        F.col("head").alias("sb"),
    )
    return sorted(
        tuple(r)
        for r in a.join(
            b,
            (F.col("id_a") < F.col("id_b")) & (F.col("la") == F.col("lb")),
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("sa", "sb").cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= k)
        .collect()
    )


def _fast(spark, rows, k=8, q=4):
    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(
        tuple(r)
        for r in editjoin.edit_near_pairs(
            df, k=k, q=q, id_col="doc_id", text_col="head",
            block_col="lang",
        ).collect()
    )


def _mutate(rng, s, n_edits):
    s = list(s)
    for _ in range(n_edits):
        op = rng.choice("sid")
        pos = rng.randrange(max(1, len(s)))
        if op == "s" and s:
            s[pos % len(s)] = rng.choice(string.ascii_lowercase)
        elif op == "i":
            s.insert(pos, rng.choice(string.ascii_lowercase))
        elif op == "d" and len(s) > 1:
            del s[pos % len(s)]
    return "".join(s)


def test_matches_brute_on_templated_corpus(spark):
    """Long strings (prefix-filter path): templated families at edit
    distances straddling k, plus unrelated strings."""
    rng = random.Random(42)
    bases = [
        "".join(rng.choice(string.ascii_lowercase + "    ") for _ in range(64))
        for _ in range(6)
    ]
    rows, i = [], 0
    for bi, t in enumerate(bases):
        for n_edits in (0, 1, 4, 8, 9, 12):
            rows.append((i, f"l{bi % 2}", _mutate(rng, t, n_edits)))
            i += 1
    got = _fast(spark, rows)
    want = _brute(spark, rows)
    assert got == want
    assert len(want) > 0  # the corpus really has near pairs


def test_short_string_fallback(spark):
    """Strings below q*(k+1) chars can lose EVERY gram to k edits —
    they must still pair via the fallback (incl. short×long at the
    length band edge and short×short)."""
    rows = [
        (1, "en", "abcdefgh"),            # 8 chars, short
        (2, "en", "zyxwvuts"),            # short, distance 8 from 1
        (3, "en", "abcdefgh" + "x" * 8),  # 16 chars, short, d=8 from 1
        (4, "en", "a" * 40),              # long
        (5, "en", "a" * 40 + "b" * 8),    # long, d=8 from 4
        (6, "fr", "abcdefgh"),            # same text, other block
    ]
    got = _fast(spark, rows, k=8, q=4)
    want = _brute(spark, rows, k=8)
    assert got == want
    pairs = {(a, b) for a, b, _ in got}
    assert (1, 2) in pairs and (1, 3) in pairs and (4, 5) in pairs
    assert not any(6 in p for p in pairs)  # block respected


def test_boundary_and_duplicate_grams(spark):
    """d == k exactly (must be kept, with the exact distance) and
    strings made of ONE repeated gram (set-semantics duplicates)."""
    rows = [
        (1, "en", "ab" * 32),
        (2, "en", "ab" * 28 + "cd" * 4),  # d = 8 exactly
        (3, "en", "ab" * 24 + "ef" * 8),  # d = 16, out
    ]
    got = _fast(spark, rows)
    assert got == [(1, 2, 8)]


@pytest.mark.parametrize("k,q", [(2, 3), (4, 2)])
def test_other_thresholds(spark, k, q):
    rng = random.Random(7)
    t = "".join(rng.choice(string.ascii_lowercase) for _ in range(48))
    rows = [
        (i, "en", _mutate(rng, t, e))
        for i, e in enumerate([0, 1, k, k + 1, 3 * k])
    ]
    assert _fast(spark, rows, k=k, q=q) == _brute(spark, rows, k=k)
