"""Text primitives: characters, tokens, shingles.

These generalize the reference's flagship client (char frequency,
``Sample Client/SampleClient.cpp:34-50``) into reusable column builders.
Tokenization is whitespace splitting with empty-token filtering — identical
semantics to DuckDB ``string_split`` oracles (both engines keep a trailing
empty token on trailing delimiters; both sides filter it).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def chars(text: Column | str) -> Column:
    """Array of single characters (split on the empty pattern)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, ""), lambda ch: ch != "")


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != "")


def _positions(count: Column) -> Column:
    # sequence(1, 0) in Spark yields a DESCENDING [1, 0], not [] — guard the
    # shorter-than-n case explicitly.
    return F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )


def char_ngrams(text: Column | str, n: int) -> Column:
    """Array of character n-grams via transform over a position sequence —
    JVM-side, no UDF. Empty array for texts shorter than n."""
    c = F.col(text) if isinstance(text, str) else text
    count = F.length(c) - F.lit(n - 1)
    return F.transform(_positions(count), lambda i: c.substr(i, F.lit(n)))


def ngrams_of_tokens(toks: Column, n: int) -> Column:
    """Word n-grams from an ALREADY-TOKENIZED array column.

    Use this (after projecting ``tokens(text)`` into its own column) rather
    than :func:`token_ngrams` when the source text is non-trivial: expanding
    ``tokens(text)`` inline here would re-run split+filter over the full
    text once per n-gram lambda evaluation — measured ~4× slowdown on the
    minhash pipeline.
    """
    count = F.size(toks) - F.lit(n - 1)
    return F.transform(_positions(count), lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def token_ngrams(text: Column | str, n: int) -> Column:
    """Array of word n-grams (space-joined) — shingles for Jaccard/MinHash.
    Convenience form; prefer tokenize-once + :func:`ngrams_of_tokens` in
    hot paths (see that function's warning)."""
    return ngrams_of_tokens(tokens(text), n)
