"""Cross-engine parity of the portable 60-bit hash — the foundation every
dedup/minhash oracle rests on: Spark, DuckDB, and a pure-Python md5
reference must agree bit-for-bit on arbitrary strings."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st

from thread_based_map_reduce_spark.functions.hashing import (
    MINHASH_PARAMS,
    MINHASH_PRIME,
    minhash_perm,
    portable_hash64,
    portable_hash64_sql,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _py_hash(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
        min_size=0,
        max_size=30,
    ),
    min_size=1,
    max_size=8,
).map(lambda ts: ts + ["", "hello", "a b  c", "naïve—☃"])


@SETTINGS
@given(ts=texts)
def test_hash_parity_three_ways(spark, ts):
    ts = list(dict.fromkeys(ts))  # distinct, order-stable
    df = spark.createDataFrame([(t,) for t in ts], "s string")
    got_spark = {r.s: r.h for r in df.select("s", portable_hash64("s").alias("h")).collect()}

    con = duckdb.connect()
    got_duck = {}
    for t in ts:
        got_duck[t] = con.execute(
            f"SELECT {portable_hash64_sql('?')}", [t]
        ).fetchone()[0]

    for t in ts:
        assert got_spark[t] == got_duck[t] == _py_hash(t), repr(t)


def test_minhash_perm_parity(spark):
    """The (a*h+b) mod p permutation must agree between the Spark column
    builder and the SQL the oracles inline."""
    import duckdb

    from pyspark.sql import functions as F

    hs = [0, 1, MINHASH_PRIME - 1, 123456789, 2**31]
    df = spark.createDataFrame([(h,) for h in hs], "h long")
    con = duckdb.connect()
    for i, (a, b) in enumerate(MINHASH_PARAMS[:4]):
        got = {
            r.h: r.p
            for r in df.select(
                "h", minhash_perm(F.col("h") % MINHASH_PRIME, i).alias("p")
            ).collect()
        }
        for h in hs:
            want = con.execute(
                f"SELECT ({a}::BIGINT * (?::BIGINT % {MINHASH_PRIME}) + {b}) % {MINHASH_PRIME}",
                [h],
            ).fetchone()[0]
            assert got[h] == want, (i, h)
