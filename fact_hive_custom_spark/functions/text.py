"""Text column expressions (tokenization, shingling).

Whitespace tokenization matches the fixture corpus; swap the pattern
for a BPE-ish regex (`F.split(col, r"\\s+|(?=[^\\w\\s])")`) for real
text without touching any operator built on these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """array<string> of whitespace tokens."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def ngram_shingles(text: Column | str, k: int) -> Column:
    """array<string> of distinct k-word shingles (empty below k tokens).

    The position sequence is guarded: Spark's sequence(1, n) runs
    BACKWARDS for n < 1, so short documents get an explicit empty
    array instead of a descending-range surprise.
    """
    toks = tokens(text)
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " ")))
