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


def _lsh(spark, rows, k=8, q=4):
    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(
        tuple(r)
        for r in editjoin.edit_near_pairs_lsh(
            df, k=k, q=q, id_col="doc_id", text_col="head",
            block_col="lang",
        ).collect()
    )


def test_lsh_matches_brute_on_template_corpus(spark):
    """The loose-k LSH path (r10 re-scope of the quadratic entry):
    recall certificate on a FIXED template-mutation corpus shaped like
    the real one — exact copies (J=1, caught with probability exactly
    1), small localized edits (high gram Jaccard), plus far strings
    and cross-block twins. MinHash is deterministic (seeded hash
    family, xxhash64), so this pins recall 1.0 on this corpus forever;
    precision is structural (banded-Levenshtein verify)."""
    rng = random.Random(11)
    bases = [
        "".join(rng.choice(string.ascii_lowercase + "   ") for _ in range(64))
        for _ in range(5)
    ]
    rows, i = [], 0
    for bi, t in enumerate(bases):
        rows.append((i, "en", t)); i += 1
        rows.append((i, "en", t)); i += 1                      # d=0 twin
        s = list(t); s[10] = "q"; s[11] = "z"                  # d<=2
        rows.append((i, "en", "".join(s))); i += 1
        s = list(t); s[20:26] = "qzqzqz"                       # d<=6 localized
        rows.append((i, "en", "".join(s))); i += 1
        rows.append((i, "fr", t)); i += 1                      # other block
    got = _lsh(spark, rows)
    want = _brute(spark, rows)
    assert got == want
    assert len(want) >= 5 * 6  # each family pairs up within its block


def test_lsh_precision_is_structural(spark):
    """Anagram-ish heads share every 4-gram-derived bucket risk but sit
    far in edit distance — verification must drop them; and identical
    text in different blocks must not pair."""
    a = "the quick brown fox jumps over the lazy dog and runs far away now"[:64]
    b = a[32:] + a[:32]  # same char mass, large edit distance
    rows = [(1, "en", a), (2, "en", b), (3, "de", a)]
    got = _lsh(spark, rows)
    assert got == _brute(spark, rows)
    assert not any((1, 3) == (p[0], p[1]) for p in got)


def test_lsh_subset_of_brute_under_scattered_edits(spark):
    """Adversarial scattered mutations (each edit lands anywhere, so a
    d=8 pair can destroy ~half its distinct grams): the LSH stage may
    MISS such pairs — that is the documented recall trade — but must
    never emit a false pair and never mistake the distance."""
    rng = random.Random(99)
    t = "".join(rng.choice(string.ascii_lowercase) for _ in range(64))
    rows = [(i, "en", _mutate(rng, t, e)) for i, e in enumerate([0, 0, 4, 8, 12])]
    got = set(_lsh(spark, rows))
    want = set(_brute(spark, rows))
    assert got <= want
    # the J=1 twin is caught with probability exactly 1
    assert (0, 1, 0) in got


def test_lsh_short_string_fallback(spark):
    """Heads below q*(k+1) chars can lose their whole gram set to k
    edits (J can reach 0 — the LSH recall argument is vacuous), so the
    approximate path must route them through the exact brute leg: a
    short disjoint-gram pair within k is STRUCTURALLY guaranteed, not
    probabilistically."""
    rows = [
        (1, "en", "abc"),                 # 1 clamped gram, J=0 vs 2
        (2, "en", "xyz"),                 # d=3 <= 8, disjoint grams
        (3, "en", "abcdefgh" + "q" * 20), # 28 chars, short at q=4,k=8
        (4, "en", "abcdefgh" + "q" * 24), # d=4 from 3
        (5, "en", "m" * 64),              # long, no partner
        (6, "fr", "abc"),                 # other block
    ]
    got = _lsh(spark, rows, k=8, q=4)
    want = _brute(spark, rows, k=8)
    assert got == want
    pairs = {(a, b) for a, b, _ in got}
    assert (1, 2) in pairs and (3, 4) in pairs
    assert not any(6 in p for p in pairs)


def test_lsh_mid_band_recall_is_structural(spark):
    """Heads in [q*(k+1), 2*k*q) chars with SCATTERED k edits sit at
    the LSH worst case (gram Jaccard ~(n-kq)/(n+kq) ~ 0.06 just above
    the 36-char cutoff; catch probability ~2e-4 at 16x4 banding —
    ADVICE r10). The mid band takes the exact ED-Join prefix leg, so
    recall here must be EQUALITY to brute, not subset."""
    rng = random.Random(7)
    rows, i = [], 0
    for ln in (36, 40, 50, 63):
        t = "".join(rng.choice(string.ascii_lowercase) for _ in range(ln))
        rows.append((i, "en", t)); i += 1
        rows.append((i, "en", _mutate(rng, t, 8))); i += 1  # scattered d<=8
    # boundary-crossing pair: the 62-char side is mid, the 68-char side
    # is in the LSH population — only the mid leg can emit this pair
    t = "".join(rng.choice(string.ascii_lowercase) for _ in range(62))
    rows.append((i, "en", t)); i += 1
    rows.append((i, "en", t + "qqqqqq")); i += 1
    got = _lsh(spark, rows)
    want = _brute(spark, rows)
    assert got == want
    assert any(d > 0 for (_, _, d) in want)  # non-exact pairs exist
    ids = {(a, b) for (a, b, _) in want}
    assert (8, 9) in ids  # the boundary-crossing pair was a true pair


def test_mid_band_brute_gate_equals_prefix_path(spark, monkeypatch):
    """The r11 small-regime gate (MID_BRUTE_MAX_PAIRS): under the
    product bound the mid leg is the broadcast theta join, above it the
    ED-Join prefix pipeline — both must emit the IDENTICAL pair set
    (the gate may only change candidate-generation cost, never the
    verified output). Run the same mid-band corpus through both paths
    by pinning the gate fully open, then fully closed."""
    rng = random.Random(11)
    rows, i = [], 0
    for ln in (36, 38, 44, 50, 58, 63):
        t = "".join(rng.choice(string.ascii_lowercase) for _ in range(ln))
        rows.append((i, "en", t)); i += 1
        rows.append((i, "en", _mutate(rng, t, 8))); i += 1
    # partner band edge: 63-char mid vs 71-char partner (|dn| = 8)
    t = "".join(rng.choice(string.ascii_lowercase) for _ in range(63))
    rows.append((i, "en", t)); i += 1
    rows.append((i, "en", t + "zzzzzzzz")); i += 1

    monkeypatch.setattr(editjoin, "MID_BRUTE_MAX_PAIRS", 10**12)
    via_brute = _lsh(spark, rows)
    monkeypatch.setattr(editjoin, "MID_BRUTE_MAX_PAIRS", 0)
    via_prefix = _lsh(spark, rows)
    assert via_brute == via_prefix == _brute(spark, rows)
    assert any(d > 0 for (_, _, d) in via_brute)


def test_mid_band_prefix_branch_plan_is_length_keyed(spark, monkeypatch):
    """r11 verdict task 7: the length-keyed candidate join (|Δn| ≤ k
    exploded into the (blk, gram, n_b) equi-join key — the fix that
    took the deep exponent 1.63 → 1.11) only executes at amplified
    scale, because sf0.01 takes the brute gate. Pin the plan shape the
    way test_cbo pins broadcast decisions, so a regression to the
    (blk, gram)-only join cannot land silently: (1) the CURRENT code,
    gate pinned closed, must plan the mid-band candidate join with an
    explode(sequence(n − k, n + k)) feeding a hash-join key, and
    (2) the committed amplified-scale dump must carry the same shape.
    """
    import os

    rng = random.Random(7)
    rows = []
    for i, ln in enumerate((36, 40, 48, 56, 63)):
        rows.append((i, "en", "".join(rng.choice(string.ascii_lowercase) for _ in range(ln))))
    df = spark.createDataFrame(rows, "doc_id long, lang string, head string")
    b = df.select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("blk"),
        F.col("head").alias("s"),
        F.length("head").alias("n"),
    )
    monkeypatch.setattr(editjoin, "MID_BRUTE_MAX_PAIRS", 0)
    pairs = editjoin._mid_exact_pairs(b, k=8, q=4)
    plan = pairs._sc._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    # the explode over the admissible-length window exists...
    assert "sequence((n#" in plan and "- 8)" in plan and "+ 8)" in plan, plan
    # ...and its output n_b participates in a hash-join KEY (not a
    # post-join filter): the formatted plan prints key lists as
    # "Left keys [3]: [blk#…, gram#…, n_b#…]"
    import re

    assert re.search(r"keys \[3\]: \[blk#\d+, gram#\d+, n_b#\d+", plan), plan

    dump = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
        "edit_near_dups_lsh_after_10x.txt",
    )
    with open(dump) as fh:
        committed = fh.read()
    assert "explode(sequence((n#" in committed
    assert re.search(r"keys \[3\]: \[blk#\d+, gram#\d+, n_b#\d+", committed), (
        "the committed amplified-scale dump lost the length-keyed join"
    )
