"""The two char-n-gram forms must agree exactly: ``char_ngrams`` (substr
per position, the single-expression convenience) and
``char_ngrams_of_chars`` (O(1) element access over a PROJECTED char
array, the hot-path form) — including on unicode, where substr counts
codepoints and split("") yields per-codepoint elements."""

from __future__ import annotations

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.functions.textfns import (
    char_ngrams,
    char_ngrams_of_chars,
)

CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "a b  c",
    "naïve—☃ snow",
    "日本語のテキスト",
    "x" * 7,
    "mixé 字x",
]


def test_char_ngram_forms_agree(spark):
    for n in (2, 3, 4):
        df = spark.createDataFrame([(s,) for s in CASES], "s string")
        rows = (
            df.select(F.split("s", "").alias("cs"), F.col("s"))
            .select(
                "s",
                char_ngrams("s", n).alias("sub"),
                char_ngrams_of_chars(F.col("cs"), n).alias("arr"),
            )
            .collect()
        )
        for r in rows:
            assert r.sub == r.arr, (n, r.s, r.sub, r.arr)
