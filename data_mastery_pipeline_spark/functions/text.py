"""Text-analysis functions for LLM-data pipelines (BASELINE.json scope):
tokenization, token counting, quality scoring, language-ID heuristic,
document fingerprinting.

All pure Catalyst expressions (split/regexp/aggregate/array ops) — no
Python UDFs — so they vectorize inside whole-stage codegen and scale
linearly with executors. Designed for the ``documents`` table
(doc_id, text, lang, source, n_chars) but column-generic.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

# Indicator stopwords per language for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic so the operator is
# oracle-reproducible; a production list would be larger.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
    "zh": ["的", "是", "在", "了", "和"],
}


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization: split on runs of whitespace after trim."""
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(t), r"\s+")


def token_count(text: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: str | Column) -> Column:
    """BPE-ish token estimate: count of word-or-punctuation units
    (``\\w+|[^\\w\\s]``) — the pre-tokenizer split most BPE vocabularies
    apply before merges."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(t, F.lit(r"\w+|[^\w\s]"))


def stopword_ratio(text: str | Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords (quality signal)."""
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: str | Column) -> Column:
    """Punctuation characters / total characters (quality signal)."""
    t = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(t), F.lit(1))


def quality_score(text: str | Column, stopwords: list[str] | None = None) -> Column:
    """Composite document-quality score in [0,1]:
    mean of (length band, stopword presence, low punctuation).

    Heuristics follow the C4/Gopher-style cheap filters: documents that
    are very short, stopword-free, or punctuation-heavy are low quality.
    """
    stopwords = stopwords or LANG_STOPWORDS["en"]
    n_tok = token_count(text)
    len_ok = (n_tok >= 10) & (n_tok <= 10000)
    sw_ok = stopword_ratio(text, stopwords) >= 0.01
    punct_ok = punct_ratio(text) <= 0.3
    return (
        len_ok.cast("double") + sw_ok.cast("double") + punct_ok.cast("double")
    ) / F.lit(3.0)


def lang_guess(text: str | Column) -> Column:
    """Stopword-vote language ID: the language whose indicator stopwords
    occur most among the document's tokens ('und' = no vote).

    Deterministic tie-break: highest vote wins, ties resolved by language
    code order (struct max over (votes, code) with inverted code sort via
    the ordered CASE cascade below).
    """
    toks = F.array_distinct(tokens(text))
    # NB: a two-parameter lambda to F.filter means (element, index) — the
    # stopword array must be bound OUTSIDE the lambda.
    votes = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in sw])))
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = F.greatest(*votes.values())
    # fold in reverse code order so the alphabetically-first language
    # achieving the max ends up outermost and wins ties
    out = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        out = F.when((votes[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def content_fingerprint(text: str | Column) -> Column:
    """Canonical content fingerprint: md5 of the sorted distinct token
    set. Word-order- and duplication-insensitive, so re-shuffled copies
    of a document collide — the exact-dedup key for near-identical
    content. SQL-portable (md5/array_sort exist in any engine)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(text))), " ")
    return F.md5(canon)


def rolling_fingerprint(text: str | Column, seed: int = 0) -> Column:
    """Order-sensitive 64-bit fingerprint: xxhash64 folded over the token
    sequence (rolling-hash style). Engine-native (xxhash64) — the fast
    production variant; use portable_rolling_fingerprint when the value
    must be reproducible outside Spark."""
    return F.aggregate(
        tokens(text),
        F.lit(seed).cast("bigint"),
        lambda acc, x: F.xxhash64(acc, x),
    )


# portable rolling hash constants: token value = first 48 md5 bits
# (md5 is everywhere); fold h = (h*B + v) mod P keeps h < 2^31 so
# h*B + v < 2.2e15 — exact int64 (and exact double) in any engine.
ROLL_B = 1_000_003
ROLL_P = 2_147_483_647


def portable_rolling_fingerprint(text: str | Column, seed: int = 0) -> Column:
    """Order-sensitive fingerprint any SQL engine can recompute:
    h = fold((h * 1000003 + md5_48(token)) mod (2^31-1)) over the token
    sequence. Same rolling-hash shape as rolling_fingerprint with the
    engine-native xxhash64 swapped for md5-prefix token values — the
    cross-engine audit form (e.g. a DuckDB/Trino consumer verifying a
    Spark-produced dedup manifest)."""
    tok_val = lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast(  # noqa: E731
        "bigint"
    )
    return F.aggregate(
        tokens(text),
        F.lit(seed).cast("bigint"),
        lambda acc, t: (acc * F.lit(ROLL_B) + tok_val(t)) % F.lit(ROLL_P),
    )


def normalize(text: str | Column) -> Column:
    """Canonical text normalization (the standard pre-dedup transform):
    lowercase, strip punctuation, collapse whitespace runs, trim.

    UNICODE letter/digit classes, not ``\\w`` (review r6, verified):
    Java's ``\\w`` is ASCII-only, so the old form deleted every CJK
    and accented character — all Chinese documents normalized to the
    EMPTY string and would mass-collapse onto one dedup fingerprint.
    ``\\p{L}\\p{N}`` is supported identically by Java regex and
    DuckDB's RE2, so the oracle mirrors exactly."""
    t = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(t)
    no_punct = F.regexp_replace(lowered, r"[^\p{L}\p{N}\s]", "")
    return F.trim(F.regexp_replace(no_punct, r"\s+", " "))


# --- repetition metrics (Gopher-style, Rae et al. 2021 §A1.1) --------------


def duplicate_fraction(arr: Column) -> Column:
    """1 − |distinct|/|all| of an array — the repeated-element mass.
    0 = all unique, →1 = one element repeated throughout."""
    n = F.size(arr)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(arr)) / n.cast("double")
    )


def lines(text: str | Column) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.split(t, r"\n")


def word_ngrams(text: str | Column, n: int) -> Column:
    """Word n-grams as strings (space-joined). Documents shorter than n
    tokens yield their whole token run as one (shorter) entry — which
    can never equal a true n-gram, so downstream joins ignore it."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))


def word_ngram_structs(text: str | Column, n: int) -> Column:
    """Word n-grams as an array of STRUCTS (arrays_zip of n shifted
    token slices) — no per-gram string ever materializes, so
    distinct-counting over them runs ~5× faster than over joined-string
    grams (the shingle_hashes trick, minus even the hash). Struct
    equality ⟺ token-tuple equality ⟺ joined-string equality (tokens
    are \\s+-split, so they can't contain the join character) — any
    distinct-count downstream matches the string formulation exactly.
    Documents shorter than n tokens yield an EMPTY array (the string
    variant yields one short entry): both give duplicate_fraction 0."""
    toks = tokens(text)
    # clamped window: short docs zip n empty slices → empty gram array
    win = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.arrays_zip(*[F.slice(toks, i + 1, win) for i in range(n)])


def repetition_metrics(text: str | Column) -> dict[str, Column]:
    """The cheap repetition family used by Gopher-style quality filters:
    duplicate-line fraction plus duplicate word 1/2/3-gram fractions.
    High values ⇒ boilerplate/spam (nav bars, keyword stuffing, logs).
    All pure Catalyst array expressions (struct n-grams — see
    word_ngram_structs); the SQL oracle mirrors them with
    list_distinct over joined-string grams, which count identically."""
    return {
        "dup_line_frac": duplicate_fraction(lines(text)),
        "dup_token_frac": duplicate_fraction(tokens(text)),
        "dup_2gram_frac": duplicate_fraction(word_ngram_structs(text, 2)),
        "dup_3gram_frac": duplicate_fraction(word_ngram_structs(text, 3)),
    }


# --- PII scrubbing ---------------------------------------------------------

# Patterns deliberately RE2-and-Java-compatible (no backrefs/lookarounds)
# so the Spark expression and the DuckDB oracle run the SAME regex.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,3}[ \-]?\d{2,4}([ \-]?\d{2,4}){2,3}\b",
}


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Match counts per PII class (pre-scrub audit metric)."""
    t = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{name}": F.regexp_count(t, F.lit(pat))
        for name, pat in PII_PATTERNS.items()
    }


def scrub_pii(text: str | Column) -> Column:
    """Replace each PII class with a typed placeholder (<EMAIL>, <IP>,
    <PHONE>) — the standard pre-training redaction transform. Order
    matters: emails first (an address would otherwise lose its host dots
    to the IP pattern on numeric domains)."""
    t = F.col(text) if isinstance(text, str) else text
    out = t
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


# --- context-window chunking ----------------------------------------------


def chunk_spans(
    text: str | Column, chunk_size: int = 512, overlap: int = 64
) -> Column:
    """Split a document into token-window chunks with overlap — the
    standard pre-training / RAG segmentation. Returns an array of
    structs (chunk_idx, chunk_text, n_chunk_tokens); chunk starts step
    by ``chunk_size − overlap`` so consecutive chunks share ``overlap``
    tokens; the final chunk may be shorter (never empty: starts stop at
    the last token). Pure Catalyst (sequence/slice/transform) — chunking
    a 100 TB corpus is a narrow map, no shuffle."""
    if overlap >= chunk_size:
        raise ValueError(f"overlap ({overlap}) must be < chunk_size ({chunk_size})")
    step = chunk_size - overlap
    toks = tokens(text)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step)
    )
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(F.slice(toks, s + 1, chunk_size), " ").alias("chunk_text"),
            F.size(F.slice(toks, s + 1, chunk_size)).alias("n_chunk_tokens"),
        ),
    )


def bigram_structs(text: str | Column) -> Column:
    """Adjacent token pairs as (w1, w2) structs — the bigram stream a
    corpus-trained language model scores. Empty for docs with < 2
    tokens. Narrow map, no shuffle."""
    toks = tokens(text)
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
