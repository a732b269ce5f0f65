"""Python UDTFs (Spark 4 user-defined table functions) — SURVEY §2.K.

The engine's rule stands: Catalyst expressions are the hot path
(functions.text.chunk_spans does corpus chunking as a narrow map with
zero Python). A UDTF is the right tool when per-row EXPANSION needs
imperative logic no expression can carry — here the same chunker is
provided as a table function so (a) the §2.K UDTF surface is a real,
tested capability and (b) the test suite can prove the Python and
Catalyst paths emit identical rows (tests/test_udtf.py), which is the
property that makes swapping a future imperative chunker (sentence
boundaries, tokenizer-aware lengths) safe.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# Mirror functions.text.tokens exactly: Spark's trim() strips SPACES
# only, and Java's \s is the ASCII class [ \t\n\x0B\f\r] — Python's
# str.split() would diverge on both (it strips Unicode whitespace like
#   and returns [] for empty text where split(trim(''), '\s+')
# returns ['']).
_JAVA_WS = re.compile(r"\s+", re.ASCII)


def _spark_tokens(text: str) -> list[str]:
    return _JAVA_WS.split(text.strip(" "))


@udtf(returnType="chunk_idx: int, chunk_text: string, n_chunk_tokens: int")
class ChunkDocsUDTF:
    """Token-window chunking with overlap — row-identical to
    functions.text.chunk_spans(chunk_size=50, overlap=10): starts step
    by 40 while ≤ last token index; final chunk may be short, never
    empty (an empty/whitespace doc yields one ['']-token chunk, exactly
    like the Catalyst path). Fixed parameters because @udtf binds the
    schema at class definition (a parameterized variant would use
    analyze())."""

    CHUNK_SIZE = 50
    OVERLAP = 10

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = _spark_tokens(text)
        step = self.CHUNK_SIZE - self.OVERLAP
        for idx, start in enumerate(range(0, max(len(toks) - 1, 0) + 1, step)):
            chunk = toks[start : start + self.CHUNK_SIZE]
            yield idx, " ".join(chunk), len(chunk)


def register_udtfs(spark) -> None:
    """Register all UDTFs on the session (idempotent)."""
    spark.udtf.register("chunk_docs", ChunkDocsUDTF)
