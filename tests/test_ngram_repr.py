"""Both Jaccard set representations (int64 bitmask for ≤63-token
vocabularies, hashed int arrays otherwise) against brute-force ground
truth — the oracle corpora are all small-vocab, so the array branch
would otherwise be unexercised."""

from __future__ import annotations

import itertools

from data_mastery_pipeline_spark.dedup import ngram


def _brute_pairs(rows, threshold):
    sets = {i: set(t.split()) for i, t, _ in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j = inter / union if union else 0.0
        if j >= threshold:
            out[(a, b)] = round(j, 6)
    return out


def _corpus(vocab):
    """Deterministic near-dup corpus over the given vocabulary: base
    docs plus perturbed copies (one token swapped)."""
    rows = []
    for i in range(12):
        # stride i*14 so 12 docs × 14 tokens sweep the WHOLE vocabulary
        # (a 120-word vocab must actually appear to force the array path)
        base = [vocab[(i * 14 + j) % len(vocab)] for j in range(14)]
        rows.append((i * 2, " ".join(base), "en"))
        near = list(base)
        near[0] = vocab[(i * 5 + 7) % len(vocab)]
        rows.append((i * 2 + 1, " ".join(near), "en"))
    return rows


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = ngram.jaccard_pairs_blocked(
        df, length_tolerance=0.5, threshold=0.5, **kw
    ).collect()
    return {(r["id_a"], r["id_b"]): round(r["jaccard"], 6) for r in got}


def test_bitmask_branch_matches_brute_force(spark):
    vocab = [f"w{i}" for i in range(40)]  # ≤63 → bitmask path
    rows = _corpus(vocab)
    got = _run(spark, rows)
    assert got == _brute_pairs(rows, 0.5)
    assert got  # the corpus genuinely contains qualifying pairs


def test_array_branch_matches_brute_force_and_bitmask_semantics(spark):
    vocab = [f"w{i}" for i in range(120)]  # >63 → array path under auto
    rows = _corpus(vocab)
    got_auto = _run(spark, rows)
    assert got_auto == _brute_pairs(rows, 0.5)
    # forcing the array path on the SMALL-vocab corpus must reproduce
    # the bitmask branch bit-for-bit
    small_rows = _corpus([f"w{i}" for i in range(40)])
    assert _run(spark, small_rows, set_repr="array") == _run(spark, small_rows)


def test_bitmask_request_on_large_vocab_is_loud(spark):
    import pytest

    rows = _corpus([f"w{i}" for i in range(120)])
    df_rows = rows
    with pytest.raises(ValueError, match="bitmask"):
        _run(spark, df_rows, set_repr="bitmask")


def test_bitmask_out_of_vocab_token_fails_loudly(spark, monkeypatch):
    """If the data drifts between the plan-time vocabulary probe and
    execution (nondeterministic source, re-executed lineage), an
    out-of-dictionary token must RAISE, not silently encode to no bit
    and corrupt every Jaccard it touches (ADVICE r04). Simulated by
    pinning the probe to a vocabulary missing one live token."""
    import pytest

    df = spark.createDataFrame(
        [(1, "en", "aa bb cc"), (2, "en", "aa bb dd")],
        "doc_id long, lang string, text string",
    )
    monkeypatch.setattr(ngram, "_small_vocab", lambda *a, **k: ["aa", "bb", "cc"])
    with pytest.raises(Exception, match="absent from the probed vocabulary"):
        ngram.jaccard_pairs_blocked(df, threshold=0.1).collect()


def test_lossless_length_bound_finds_containment_pairs(spark):
    """Review r6: the default ±20% length tolerance is a recall/cost
    knob that DROPS a short doc fully contained in a long one;
    length_tolerance=None (exact Jaccard bound [n·t, n/t]) must find
    it. Pins both behaviors so the trade stays deliberate."""
    from data_mastery_pipeline_spark.dedup import ngram

    short = " ".join(f"w{i}" for i in range(40))
    long_ = " ".join(f"w{i}" for i in range(80))  # J = 40/80 = 0.5
    docs = spark.createDataFrame(
        [(1, short, "en"), (2, long_, "en")], "doc_id bigint, text string, lang string"
    )
    t = 0.45
    strict = ngram.jaccard_pairs_blocked(docs, threshold=t).collect()
    assert strict == []  # 80 vs 40 tokens: outside ±20%
    loose = ngram.jaccard_pairs_blocked(
        docs, threshold=t, length_tolerance=None
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in loose] == [(1, 2)]
    # prefix path agrees under the same bound
    loose_p = ngram.jaccard_pairs_prefix(
        docs, threshold=t, length_tolerance=None
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in loose_p] == [(1, 2)]


# --- simhash-cell blocked pairs (r12 near_dup_clusters re-scope) ----------


def _run_celled(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = ngram.jaccard_pairs_celled(
        df, length_tolerance=0.5, threshold=0.5, **kw
    ).collect()
    return {(r["id_a"], r["id_b"]): round(r["jaccard"], 6) for r in got}


def test_celled_pairs_are_blocked_pairs_restricted_to_cells(spark):
    """The celled edge definition = the blocked definition ∩ cell
    co-membership: every celled pair is a blocked pair with the SAME
    jaccard value (the verification layer is shared), and every
    IDENTICAL-set pair (J = 1) survives the blocking — identical token
    sets have identical set-simhash fingerprints, so co-celling is
    structural, not probabilistic."""
    vocab = [f"tok{i}" for i in range(24)]
    rows = _corpus(vocab)
    # two exact-duplicate token-set pairs (shuffled order, same set)
    rows.append((100, rows[0][1], "en"))
    rows.append((101, " ".join(reversed(rows[2][1].split())), "en"))
    blocked = _run(spark, rows)
    celled = _run_celled(spark, rows)
    assert set(celled) <= set(blocked)
    for pair, j in celled.items():
        assert j == blocked[pair]
    exact_pairs = {p for p, j in blocked.items() if j == 1.0}
    assert exact_pairs  # the corpus really contains J=1 pairs
    assert exact_pairs <= set(celled)


def test_celled_repr_parity_bitmask_vs_array(spark):
    """Both set representations produce identical celled pairs (the
    blocked-path guarantee extended to the celled path)."""
    vocab = [f"t{i}" for i in range(20)]  # ≤63 → auto picks bitmask
    rows = _corpus(vocab)
    auto = _run_celled(spark, rows)
    arr = _run_celled(spark, rows, set_repr="array")
    assert auto == arr and auto


def test_cell_bits_clamp_and_growth():
    """b = clamp(ceil(log2(n/target)), 3, 18): constant expected cell
    size at every scale, clamped at both ends; power-of-two boundaries
    land exactly (log2 is exact there in IEEE double — the property the
    DuckDB mirror relies on)."""
    assert ngram.cell_bits(0) == 3
    assert ngram.cell_bits(64) == 3
    assert ngram.cell_bits(512) == 3
    assert ngram.cell_bits(513) == 4
    assert ngram.cell_bits(5000) == 7
    assert ngram.cell_bits(64 * (1 << 18)) == 18
    assert ngram.cell_bits(10**12) == 18
    assert ngram.cell_bits(200, target_cell=64) == 3
    assert ngram.cell_bits(200000) == 12
