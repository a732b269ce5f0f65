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
    sequence (rolling-hash style). Engine-native (xxhash64) — checked
    rows-only, no SQL oracle."""
    return F.aggregate(
        tokens(text),
        F.lit(seed).cast("bigint"),
        lambda acc, x: F.xxhash64(acc, x),
    )


def normalize(text: str | Column) -> Column:
    """Canonical text normalization (the standard pre-dedup transform):
    lowercase, strip punctuation, collapse whitespace runs, trim."""
    t = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(t)
    no_punct = F.regexp_replace(lowered, r"[^\w\s]", "")
    return F.trim(F.regexp_replace(no_punct, r"\s+", " "))
