"""Catalog queries exercising the generic map/reduce parity surface.

These run the SAME logical queries as their declarative twins but through
the opaque-callback path (``run_map_reduce`` → mapInPandas/applyInPandas),
proving the reference's client contracts hold: per-row flatMap with 0..N
emissions (``MapReduceClient.h:57-58``), reduce over a key's full value
vector with 0..N emissions, unordered group values (SURVEY §1.4).

They are deliberately NOT in the bench headline set — the Python callback
path is the slow lane by design; the declarative twins are the scale path.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession

from ..mapreduce import run_map_reduce
from ..plans.catalog import register
from ..sources.registry import load_table


@register(
    "mr_charcount",
    oracle="""
        SELECT ch, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
        WHERE ch <> ''
        GROUP BY ch
    """,
    doc="Flagship char-count via the generic map/reduce API (SampleClient.cpp:34-65 "
    "contract: map pre-aggregates per string like C1, reduce sums like C2)",
    tags=("parity", "mapreduce"),
)
def q_mr_charcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")

    def map_fn(row):
        # mirrors the sample client's map: per-string char counts (partial
        # aggregation in the map, SampleClient.cpp:34-50)
        return Counter(row.text).items()

    def reduce_fn(key, pdf):
        yield (key[0], int(pdf["partial"].sum()))

    return run_map_reduce(
        docs,
        map_fn,
        reduce_fn,
        map_schema="ch string, partial long",
        out_schema="ch string, cnt long",
        key_cols=["ch"],
    )


@register(
    "mr_wordcount_filtered",
    oracle="""
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' AND length(word) >= 4
        GROUP BY word
        HAVING count(*) >= 10
    """,
    doc="Word count via generic API with 0-emit map rows (short words dropped) "
    "and 0-emit reduce groups (rare words dropped) — the emit-0..N parity edge",
    tags=("parity", "mapreduce"),
)
def q_mr_wordcount_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")

    def map_fn(row):
        # 0..N emissions per row: filtering inside map (a map that emits
        # nothing for dropped items — legal per MapReduceClient.h:57-58)
        for w in row.text.split(" "):
            if len(w) >= 4:
                yield (w, 1)

    def reduce_fn(key, pdf):
        n = int(pdf["one"].sum())
        if n >= 10:  # 0-emit reduce: HAVING expressed as "emit nothing"
            yield (key[0], n)

    return run_map_reduce(
        docs,
        map_fn,
        reduce_fn,
        map_schema="word string, one long",
        out_schema="word string, n long",
        key_cols=["word"],
    )


@register(
    "mr_lang_source_expand",
    oracle="""
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents
        GROUP BY lang, source
    """,
    doc="Multi-emit reduce: one group per lang, reduce emits one row per "
    "distinct source within it (reduce as group→N-row UDTF, R8)",
    tags=("parity", "mapreduce"),
)
def q_mr_lang_source_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")

    def map_fn(row):
        yield (row.lang, row.source)

    def reduce_fn(key, pdf):
        # N emissions per group: the reference's reduce may call emit3 any
        # number of times (MapReduceClient.h:62-64)
        for source, n in sorted(Counter(pdf["source"]).items()):
            yield (key[0], source, int(n))

    return run_map_reduce(
        docs,
        map_fn,
        reduce_fn,
        map_schema="lang string, source string",
        out_schema="lang string, source string, n_docs long",
        key_cols=["lang"],
    )
