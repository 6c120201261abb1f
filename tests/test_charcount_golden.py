"""Golden test: the reference's demo fixture ported verbatim.

Inputs are the 3 hard-coded strings from ``Sample Client/SampleClient.cpp:
74-79``; the oracle is an exact Python ``collections.Counter`` — 21
distinct characters, e.g. 's' → 7, 'i' → 8, ' ' → 10 (FIXTURES.md §A).
Output order is NOT asserted (not a contract: MapReduceFramework.cpp:158-161).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from thread_based_map_reduce_spark.functions.textfns import chars
from thread_based_map_reduce_spark.mapreduce import run_map_reduce

STRINGS = [
    "This string is full of characters",
    "Multithreading is awesome",
    "race conditions are bad",
]
ORACLE = Counter("".join(STRINGS))


def _as_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(STRINGS)], schema="doc_id long, text string"
    )


def test_declarative_charcount_matches_counter(spark):
    df = (
        _as_df(spark)
        .select(F.explode(chars("text")).alias("ch"))
        .groupBy("ch")
        .agg(F.count("*").alias("cnt"))
    )
    got = {r.ch: r.cnt for r in df.collect()}
    assert got == dict(ORACLE)
    assert len(got) == 21
    assert got["s"] == 7 and got["i"] == 8 and got[" "] == 10


def test_mapreduce_charcount_matches_counter(spark):
    def map_fn(row):
        return Counter(row.text).items()

    def reduce_fn(key, pdf):
        yield (key[0], int(pdf["partial"].sum()))

    out = run_map_reduce(
        _as_df(spark).select("text"),
        map_fn,
        reduce_fn,
        map_schema="ch string, partial long",
        out_schema="ch string, cnt long",
        key_cols=["ch"],
    )
    got = {r.ch: r.cnt for r in out.collect()}
    assert got == dict(ORACLE)
